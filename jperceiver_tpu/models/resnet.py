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
import jax
import jax.numpy as jnp

from ..ops.pallas.maxpool import max_pool_3x3_s2
from .common import BatchNorm, Conv3x3

_STAGES = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def resnet_stage_sizes(depth: int) -> Sequence[int]:
    return _STAGES[depth]


def stem_tap_stack(x: jax.Array, dtype) -> jax.Array:
    """`StemConv`'s weight-independent operand: the 16-tap space-to-depth
    stack of `x` — (B, H/2+1, W/2+1, 16*4C) in `dtype`.

    Factored out so callers with SEVERAL stems on the SAME input (the depth
    and layout encoders both stem `(color_aug0-0.45)/0.225`,
    `depth_encoder.py:35-44` / `layout_model.py:86-113`) can build it once
    and share it (`share_stem` knob). Whole-step neutral: XLA CSEs the
    duplicate forward constructions AND merges the duplicate backward
    chains at full scale (DESIGN.md round-5 postmortem, queue_r5e
    alternating A/B); kept for the smaller traced graph.
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # Space-to-depth via reshape+transpose. (A strided-slice + concat
    # formulation measured 8 ms SLOWER per step: lane-stride-2 slices
    # on W-in-lanes layouts are pathological on v5e.)
    hb, wb = (h + 2) // 2, (w + 2) // 2
    xs = xp.reshape(b, hb, 2, wb, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, hb, wb, 4 * c)
    xsp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ho, wo = hb - 1, wb - 1
    taps = [
        xsp[:, jy:jy + ho, jx:jx + wo, :]
        for jy in range(4) for jx in range(4)
    ]
    return jnp.concatenate(taps, axis=-1).astype(dtype)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        identity = x
        y = Conv3x3(self.features, strides=self.strides, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = Conv3x3(self.features, use_bias=False,
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
        norm = lambda name: BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        out_features = self.features * 4
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = Conv3x3(self.features, strides=self.strides, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(out_features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = norm("bn3")(y)
        if self.strides != 1 or x.shape[-1] != out_features:
            identity = nn.Conv(out_features, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class StemConv(nn.Module):
    """7x7/stride-2 stem conv computed as a space-to-depth 4x4/stride-1 conv.

    Mathematically identical to `nn.Conv(64, (7,7), (2,2), padding=3)` and
    stores the SAME `kernel` param (7,7,C,64) under the same name, but the
    few-input-channel 7x7 weight-gradient conv — which the TPU runs at ~3%
    lane utilization (5.8 ms/encoder at 1024^2, C=3) — becomes a 4x4 conv
    over 4C block channels (sub-ms). Standard TPU ResNet formulation.

    Derivation (per axis): y[o] = sum_k w[k] x[2o+k-3], k<7. Zero-extend to
    k<8 and split k = 2j+e: with xp = pad(x, 1) and blocks P[m,e]=xp[2m+e],
    y[o] = sum_{j<4,e<2} w[2j+e] P[o+j-1, e] — a 4-tap stride-1 conv over
    the block grid with SAME-style padding (1,1).
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, stack: jax.Array | None = None):
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, c, self.features), jnp.float32)
        k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        # w4[jy, jx, (ey, ex, c), o] = k8[2jy+ey, 2jx+ex, c, o]
        k4 = k8.reshape(4, 2, 4, 2, c, self.features)
        k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        # The 4x4/s1 conv as ONE (B*H*W, 16*4C) @ (16*4C, O) matmul over a
        # tap-stacked operand (16 shifted views concatenated in lanes) —
        # the conv9dot idea with all taps in one contraction. XLA's conv
        # WEIGHT-grad for this shape still ran at ~3.5 TFLOP/s (1.8 ms per
        # encoder, round-3 trace); the matmul transpose is a dense
        # (16*4C, B*H*W) @ (B*H*W, O) reduction on the MXU.
        if stack is None:
            stack = stem_tap_stack(x, self.dtype)
        k16 = k4.reshape(16 * 4 * c, self.features).astype(self.dtype)
        return jnp.einsum("bhwk,ko->bhwo", stack, k16)


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
    def __call__(self, x, train: bool = False, stem_stack=None):
        block = BasicBlock if self.depth <= 34 else Bottleneck
        stages = _STAGES[self.depth]

        feats = []
        # Model resolutions are even (encoder needs height % 32 == 0), which
        # the space-to-depth stem requires.
        y = StemConv(64, dtype=self.dtype, name="conv1")(x, stem_stack)
        y = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        feats.append(y)

        # Equality-mask custom backward — XLA's select-and-scatter for this
        # pool costs ~2.5 ms/encoder at 512^2x64 (see ops/pallas/maxpool.py).
        y = max_pool_3x3_s2(y)
        widths = (64, 128, 256, 512)
        for stage_idx, (width, blocks) in enumerate(zip(widths, stages)):
            for block_idx in range(blocks):
                strides = 2 if (stage_idx > 0 and block_idx == 0) else 1
                y = block(width, strides, self.dtype,
                          name=f"layer{stage_idx + 1}_{block_idx}")(y, train)
            feats.append(y)
        return feats
