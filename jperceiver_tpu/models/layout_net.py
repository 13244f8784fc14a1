"""BEV layout branch: encoder, cycled view projection (CVP), cross-view
cross-modal transformer (CCT), and the layout decoder.

Parity targets: `layout_model.py:56-201`, `CycledViewProjection.py:11-67`,
`CrossViewTransformer.py:14-92`. All attention runs over tiny 8x8 feature
maps — batched matmuls that XLA places straight onto the MXU; no
sequence-parallel machinery is needed (SURVEY §5).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import BatchNorm, Conv3x3, ConvReflect3x3
from .resnet import ResNet


class LayoutEncoder(nn.Module):
    """Front-view image -> (B, S/32, S/32, 128) with S = occ_map_size.

    ResNet trunk + two 3x3 reduce convs with 2x2 max-pools
    (`layout_model.py:56-113`; input normalization matches torchvision
    pretrained stats via the same (x-0.45)/0.225 the reference keeps using).
    """

    depth: int = 18
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False, stem_stack=None):
        x = (img - 0.45) / 0.225
        feats = ResNet(self.depth, dtype=self.dtype, name="resnet_encoder")(
            x, train, stem_stack)
        y = ConvReflect3x3(128, self.dtype, name="conv1")(feats[-1])
        y = nn.max_pool(y, (2, 2), (2, 2))
        y = ConvReflect3x3(128, self.dtype, name="conv2")(y)
        y = nn.max_pool(y, (2, 2), (2, 2))
        return y


class TransformModule(nn.Module):
    """Per-channel MLP over the flattened spatial dim (`CycledViewProjection.py:27-67`)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = self.dim * self.dim
        assert h == self.dim and w == self.dim, (h, w, self.dim)
        y = x.transpose(0, 3, 1, 2).reshape(b, c, n)
        y = nn.relu(nn.Dense(n, dtype=self.dtype, name="fc1")(y))
        y = nn.relu(nn.Dense(n, dtype=self.dtype, name="fc2")(y))
        return y.reshape(b, c, h, w).transpose(0, 2, 3, 1)


class CycledViewProjection(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        transform = TransformModule(self.dim, self.dtype, name="transform_module")(x)
        retransform = TransformModule(self.dim, self.dtype, name="retransform_module")(transform)
        return transform, retransform


class CrossViewTransformer(nn.Module):
    """CCT attention (`CrossViewTransformer.py:27-92`).

    Cross-view: hard attention — for every front-view position, the max
    similarity against the cycled top-view features selects a value vector
    and scales the fused residual. Cross-modal: the same max-similarity map
    mixes in depth-encoder features via an 8x8 spatial matmul (the
    reference's broadcasted `attn @ V` quirk, reproduced bit-for-bit).
    """

    features: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, front_x, cross_x, front_x_hat, depth_feature):
        b, h, w, c = front_x.shape
        n = h * w
        qk = self.features // 8
        conv1x1 = lambda f, name: nn.Conv(f, (1, 1), dtype=self.dtype, name=name)

        # Depth feature pyramid tail: 512 -> 128 with two reflect-pad convs
        # + 2x2 pools so it lands on the same (h, w) grid.
        d = ConvReflect3x3(128, self.dtype, name="conv1")(depth_feature)
        d = nn.max_pool(d, (2, 2), (2, 2))
        d = ConvReflect3x3(128, self.dtype, name="conv2")(d)
        d = nn.max_pool(d, (2, 2), (2, 2))

        q = conv1x1(qk, "query_conv")(cross_x).reshape(b, n, qk)
        k = conv1x1(qk, "key_conv")(front_x).reshape(b, n, qk)
        v = conv1x1(c, "value_conv")(front_x_hat).reshape(b, n, c)

        # energy[b, i, j] = <key_i, query_j>; reduce over key positions i.
        energy = jnp.einsum("bik,bjk->bij", k, q)
        score = energy.max(axis=1)            # (B, N) per front position
        idx = energy.argmax(axis=1)           # (B, N)
        t = jnp.take_along_axis(v, idx[..., None], axis=1).reshape(b, h, w, c)

        s_map = score.reshape(b, h, w, 1)
        fused = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="f_conv")(
            jnp.concatenate([front_x, t], axis=-1)
        )
        out = front_x + fused * s_map

        qd = conv1x1(qk, "query_conv_depth")(cross_x).reshape(b, n, qk)
        kd = conv1x1(qk, "key_conv_depth")(front_x).reshape(b, n, qk)
        vd = conv1x1(c, "value_conv_depth")(d)  # (B, h, w, C)

        attn = jnp.einsum("bik,bjk->bij", kd, qd).max(axis=1).reshape(b, h, w)
        # torch `attn @ V` with attn (B,1,h,w) and V (B,C,h,w): an (h,w)x(h,w)
        # matmul broadcast over channels.
        x_depth = jnp.einsum("bik,bkjc->bijc", attn, vd)
        out = out + x_depth
        return out, s_map, attn.reshape(b, h, w, 1)


class LayoutDecoder(nn.Module):
    """(B, S/32, S/32, 128) -> (B, S, S, num_class) logits

    (`layout_model.py:116-201`; softmax is applied by eval-time callers).
    """

    num_class: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_ch = (16, 32, 64, 128, 256)
        norm = lambda name: BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        from ..ops.sampling import upsample2x_nearest
        from .common import PreUp, fold_upconv_active

        for i in range(4, -1, -1):
            ch = num_ch[i]
            x = Conv3x3(ch, dtype=self.dtype, name=f"upconv_{i}_0")(x)
            x = nn.relu(norm(f"norm_{i}_0")(x))
            if fold_upconv_active():
                x = PreUp(x)  # Conv3x3 folds the up2 into its taps
            else:
                x = upsample2x_nearest(x)
            x = Conv3x3(ch, dtype=self.dtype, name=f"upconv_{i}_1")(x)
            x = norm(f"norm_{i}_1")(x)
        return ConvReflect3x3(self.num_class, self.dtype, name="topview")(x)
