"""Depth encoder/decoder (RefineNet-lite with CRP blocks).

Parity targets: `depth_encoder.py:8-44`, `depth_decoder.py:7-137`.
Outputs disparities at scales s=0..3 (resolutions 1/2 .. 1/16 of the input),
keyed `("disp", 0, s)` like the reference.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.sampling import upsample2x_nearest
from .common import (Conv1x1, ConvReflect3x3, ConvReflect3x3Split, CRPBlock,
                     DispConv, PreUp, fold_upconv_active)
from .resnet import ResNet


class DepthEncoder(nn.Module):
    depth: int = 18
    dtype: Any = jnp.float32

    @property
    def num_ch_enc(self):
        return ResNet(self.depth).num_ch_enc

    @nn.compact
    def __call__(self, img, train: bool = False, stem_stack=None):
        x = (img - 0.45) / 0.225
        return ResNet(self.depth, dtype=self.dtype, name="encoder")(
            x, train, stem_stack)


class DepthDecoder(nn.Module):
    bottleneck: int = 256
    dtype: Any = jnp.float32
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, feats, train: bool = False):
        l0, l1, l2, l3, l4 = feats
        lrelu = lambda v: nn.leaky_relu(v, 0.01)
        bn = self.bottleneck

        do = nn.Dropout(self.dropout_rate, deterministic=not train)
        l4 = do(l4)
        l3 = do(l3)

        def level(parts, idx):
            # iconv consumes the skip-concat WITHOUT materializing it
            # (`ConvReflect3x3Split`): the (256, 256, 1)-part concat would
            # pad 513 -> 640 lanes and cost a full extra tensor write.
            x = lrelu(
                ConvReflect3x3Split(bn, self.dtype, name=f"iconv{idx}")(parts))
            x = CRPBlock(bn, 4, self.dtype, name=f"crp{idx}")(x)
            x = lrelu(ConvReflect3x3(bn, self.dtype, name=f"merge{idx}")(x))
            if fold_upconv_active():
                # Never materialize the x2-nearest tensor: both consumers
                # (the disp head here, the next level's iconv part) fold
                # the upsample into their own conv taps (ops/conv9dot.py).
                disp = nn.sigmoid(
                    DispConv(self.dtype, name=f"disp{idx}")(PreUp(x)))
                return PreUp(x), disp
            x = upsample2x_nearest(x)
            disp = nn.sigmoid(DispConv(self.dtype, name=f"disp{idx}")(x))
            return x, disp

        x4 = Conv1x1(512, dtype=self.dtype, name="reduce4")(l4)
        x4, disp4 = level([x4], 4)

        x3 = Conv1x1(bn, dtype=self.dtype, name="reduce3")(l3)
        x3, disp3 = level([x3, x4, disp4], 3)

        x2 = Conv1x1(bn, dtype=self.dtype, name="reduce2")(l2)
        x2, disp2 = level([x2, x3, disp3], 2)

        x1 = Conv1x1(bn, dtype=self.dtype, name="reduce1")(l1)
        _, disp1 = level([x1, x2, disp2], 1)

        # String keys ("disp/<scale>") keep the outputs dict a valid JAX
        # pytree (sortable keys) across jit boundaries.
        return {"disp/3": disp4, "disp/2": disp3, "disp/1": disp2, "disp/0": disp1}
