from .synthetic import synthetic_batch, kitti_like_calib
from .splits import get_dataset, readlines, split_file
from .loader import DataLoader, collate
from .kitti import KittiOdometry, KittiRaw, KittiObject, KittiDepth
from .argoverse import Argoverse
from .calib import load_odometry_calib, load_raw_calib, read_calib_file
from .velodyne import generate_depth_map
from .folder import FolderDataset
from .aux_datasets import (
    CityscapesDataset,
    Eth3dDataset,
    EurocDataset,
    NuscenesDataset,
    SequenceFrameDataset,
)
from .utils import batch_post_process_disparity, compute_ate, dump_xyz
