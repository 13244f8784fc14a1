"""Shared conv blocks for the decoder heads."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


from ..ops.padding import reflect_pad  # noqa: F401 (re-export, legacy path)


class ConvReflect3x3(nn.Module):
    """ReflectionPad(1) + 3x3 VALID conv — the reference's `Conv3x3`

    (`layers.py:156-167`), used across depth/layout decoders and CCT.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), padding="VALID",
                       dtype=self.dtype, name="conv")(reflect_pad(x))


class DispConv(nn.Module):
    """Single-channel 3x3 prediction head, decomposed for the MXU.

    Functionally `ConvReflect3x3(1)` with the identical param tree
    (`conv/kernel` (3,3,C,1) + `conv/bias` (1,)). A C_out=1 3x3 conv is
    hostile to the TPU in every direction (forward drives 1/128 MXU
    columns, the weight-grad conv contracts to a single feature, the
    data-grad conv reads a 1-channel cotangent at 1/128 lane use — 4.1 ms
    fwd+bwd at 512^2 x 256). Reassociating the same linear map as
        z = x_padded @ W.reshape(9, C).T        (one well-shaped matmul)
        y[p] = sum_d z[p + offset_d, d]         (9 shifted scalar adds)
    keeps every op dense; autodiff then yields two thin matmuls and a
    shifted-broadcast backward instead of three degenerate convs.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # param-tree parity with ConvReflect3x3: nested "conv" module scope
        return _DispConvInner(dtype=self.dtype, name="conv")(reflect_pad(x))


class _DispConvInner(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp):
        b, hp, wp, c = xp.shape
        h, w = hp - 2, wp - 2
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c, 1), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        wc = kernel[..., 0].reshape(9, c).T  # (C, 9), d = ky*3 + kx
        z = jnp.einsum("bhwc,cd->bhwd", xp.astype(self.dtype),
                       wc.astype(self.dtype))
        y = None
        for ky in range(3):
            for kx in range(3):
                t = z[:, ky:ky + h, kx:kx + w, ky * 3 + kx]
                y = t if y is None else y + t
        return y[..., None] + bias.astype(y.dtype)


class ConvReflect3x3Split(nn.Module):
    """`ConvReflect3x3` applied to a channel-concat, without the concat.

    conv(concat(parts), W) == sum_i conv(part_i, W[:, :, off_i:off_i+c_i])
    — identical params (`conv/kernel` over the full concat width + bias),
    but skips materializing the concatenated tensor and keeps each conv's
    input channel count a clean power-of-two (the decoder's 513-channel
    concat pads to 640 lanes on TPU). 1-channel parts (the disp skip)
    contribute via the same matmul+shift decomposition as `DispConv`
    backwards: here a (HW,1)x(1,9)->(HW,9) outer product + shifted adds is
    just the direct conv, cheap at C_in=1, so lax conv is used as-is.
    """

    features: int
    dtype: Any = jnp.float32

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parts):
        # params live under a nested "conv" scope for tree parity with
        # ConvReflect3x3 (whose nn.Conv is named "conv")
        return _SplitConvInner(self.features, self.dtype, name="conv")(parts)


class _SplitConvInner(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parts):
        cs = [p.shape[-1] for p in parts]
        total = sum(cs)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, total, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = None
        off = 0
        for p, c in zip(parts, cs):
            kp = jax.lax.slice_in_dim(kernel, off, off + c, axis=2)
            pp = reflect_pad(p).astype(self.dtype)
            if c <= 4:
                # A C_in<=4 3x3 conv runs at <4/128 input-lane utilization
                # (the 1-ch disp skip cost ~3 ms at 256^2); stack the nine
                # shifted taps into 9C channels and contract on the MXU.
                h, w = p.shape[1], p.shape[2]
                taps = [pp[:, ky:ky + h, kx:kx + w, :]
                        for ky in range(3) for kx in range(3)]
                z = jnp.concatenate(taps, axis=-1)  # (B, H, W, 9C)
                wd = kp.reshape(9 * c, self.features)  # (ky,kx,c)-major
                t = jnp.einsum("bhwk,kf->bhwf", z, wd.astype(self.dtype))
            else:
                t = jax.lax.conv_general_dilated(
                    pp, kp.astype(self.dtype),
                    window_strides=(1, 1), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = t if y is None else y + t
            off += c
        return y + bias.astype(y.dtype)


class Conv1x1(nn.Module):
    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                       dtype=self.dtype, name="conv")(x)


class CRPBlock(nn.Module):
    """Chained residual pooling (`layers.py:184-199`): n stages of

    maxpool(5x5, s1) -> 1x1 conv, summed into the trunk.
    """

    features: int
    n_stages: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas.maxpool import max_pool_5x5_s1

        top = x
        for i in range(self.n_stages):
            # Custom-bwd pool: XLA's select-and-scatter backward is ~20x
            # slower on TPU (see ops/pallas/maxpool.py).
            top = max_pool_5x5_s1(top)
            top = nn.Conv(self.features, (1, 1), use_bias=False,
                          dtype=self.dtype, name=f"pointwise{i + 1}")(top)
            x = top + x
        return x
