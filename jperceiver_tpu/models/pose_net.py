"""Pose network: 6-channel ResNet encoder + tiny conv decoder.

Parity targets: `pose_encoder.py:11-92`, `pose_decoder.py:5-26`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .resnet import ResNet


class PoseEncoder(nn.Module):
    depth: int = 18
    num_input_images: int = 2
    dtype: Any = jnp.float32

    @property
    def num_ch_enc(self):
        return ResNet(self.depth).num_ch_enc

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        """imgs: (B, H, W, 3*num_input_images) — two frames channel-concat."""
        x = (imgs - 0.45) / 0.225
        return ResNet(self.depth, in_channels=3 * self.num_input_images,
                      dtype=self.dtype, name="encoder")(x, train)


class PoseDecoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        f = feats[-1]
        y = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="reduce")(f))
        y = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv1")(y))
        y = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y))
        y = nn.Conv(6, (1, 1), dtype=self.dtype, name="conv3")(y)
        y = y.mean(axis=(1, 2)) * 0.01  # (B, 6)
        axisangle = y[:, :3]
        translation = y[:, 3:]
        return axisangle, translation
