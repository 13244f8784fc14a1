from .registry import MODELS, register, build_model
from .resnet import ResNet, resnet_stage_sizes
from .depth_net import DepthEncoder, DepthDecoder
from .pose_net import PoseEncoder, PoseDecoder
from .layout_net import (
    LayoutEncoder,
    LayoutDecoder,
    CycledViewProjection,
    CrossViewTransformer,
)
from .jperceiver import JPerceiver
