"""NHWC Flax ResNet backbone (18/34/50/101).

Structural parity with the reference's self-contained torchvision-style
ResNet (`/root/reference/mono/model/mono_baseline/resnet.py:6-184`), built
TPU-first:

* NHWC layout so convolutions tile directly onto the MXU.
* Optional bfloat16 compute dtype with float32 params/batch-stats.
* Param tree names line up 1:1 with torch state-dict keys via
  `engine/checkpoint.py`'s mapping, enabling golden-parity weight import.

Returns the 5-level feature pyramid [conv1, layer1..layer4] exactly like the
reference encoders (`depth_encoder.py:35-44`).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

_STAGES = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def resnet_stage_sizes(depth: int) -> Sequence[int]:
    return _STAGES[depth]


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        identity = x
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if self.strides != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x this
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        out_features = self.features * 4
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(out_features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = norm("bn3")(y)
        if self.strides != 1 or x.shape[-1] != out_features:
            identity = nn.Conv(out_features, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """Feature-pyramid ResNet; `in_channels` > 3 gives the pose variant

    (2-frame channel concat, `pose_encoder.py:11-29`).
    """

    depth: int = 18
    in_channels: int = 3
    dtype: Any = jnp.float32

    @property
    def num_ch_enc(self):
        base = [64, 64, 128, 256, 512]
        if self.depth > 34:
            return [base[0]] + [c * 4 for c in base[1:]]
        return base

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = BasicBlock if self.depth <= 34 else Bottleneck
        stages = _STAGES[self.depth]

        feats = []
        y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        feats.append(y)

        y = nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        widths = (64, 128, 256, 512)
        for stage_idx, (width, blocks) in enumerate(zip(widths, stages)):
            for block_idx in range(blocks):
                strides = 2 if (stage_idx > 0 and block_idx == 0) else 1
                y = block(width, strides, self.dtype,
                          name=f"layer{stage_idx + 1}_{block_idx}")(y, train)
            feats.append(y)
        return feats
