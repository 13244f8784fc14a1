"""SSIM dissimilarity with 3x3 mean pooling and reflection padding.

Parity with the reference SSIM block (`layers.py:85-107`): returns
clamp((1 - SSIM)/2, 0, 1) per pixel/channel. The windowed means run as
separable row+column sums (shifted adds) over reflection-padded inputs.

Shapes: `x` and `y` are (..., H, W, C) with identical trailing (H, W, C);
leading dims broadcast. The photometric loss exploits this by passing all
P warped predictions as (P, B, H, W, C) against the target as (B, H, W, C)
— the target's window statistics are computed ONCE instead of P times.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _win3(x: jax.Array, axis: int) -> jax.Array:
    n = x.shape[axis] - 2
    s0 = jax.lax.slice_in_dim(x, 0, n, axis=axis)
    s1 = jax.lax.slice_in_dim(x, 1, n + 1, axis=axis)
    s2 = jax.lax.slice_in_dim(x, 2, n + 2, axis=axis)
    return s0 + s1 + s2


def _reflect_pad_hw(x: jax.Array) -> jax.Array:
    """1-pixel reflection pad on the (-3, -2) spatial axes (slice+concat —
    `jnp.pad(mode="reflect")` lowers ~10x slower, see `ops/padding.py`)."""
    h_ax = x.ndim - 3
    w_ax = x.ndim - 2
    x = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, 2, axis=h_ax), x,
         jax.lax.slice_in_dim(x, x.shape[h_ax] - 2, x.shape[h_ax] - 1,
                              axis=h_ax)], axis=h_ax)
    return jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, 2, axis=w_ax), x,
         jax.lax.slice_in_dim(x, x.shape[w_ax] - 2, x.shape[w_ax] - 1,
                              axis=w_ax)], axis=w_ax)


def _avg_pool3(x: jax.Array) -> jax.Array:
    """3x3/stride-1 mean over the (-3, -2) axes, VALID (caller pads).

    Separable two-pass form (row sums then column sums) — fuses into
    shifted adds instead of a 9-tap reduce-window.
    """
    return _win3(_win3(x, x.ndim - 3), x.ndim - 2) / 9.0


def ssim(x: jax.Array, y: jax.Array) -> jax.Array:
    """(..., H, W, C) pair -> per-pixel SSIM dissimilarity in [0, 1].

    Leading dims broadcast (numpy rules): stats of the smaller operand are
    computed once and broadcast into the pairwise terms.
    """
    xp = _reflect_pad_hw(x)
    yp = _reflect_pad_hw(y)

    mu_x = _avg_pool3(xp)
    mu_y = _avg_pool3(yp)
    sigma_x = _avg_pool3(xp * xp) - mu_x * mu_x
    sigma_y = _avg_pool3(yp * yp) - mu_y * mu_y
    sigma_xy = _avg_pool3(xp * yp) - mu_x * mu_y

    num = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    den = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    return jnp.clip((1.0 - num / den) * 0.5, 0.0, 1.0)
