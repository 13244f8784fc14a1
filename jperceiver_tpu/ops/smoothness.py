"""First- and second-order edge-aware disparity smoothness.

Parity with `net.py:758-786`: gradients are forward differences, image
gradients gate the penalty through exp(-0.5*|dI|), and the loss is the sum of
the six mean terms. Operates on NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sampling import resize_area


def _grad(d: jax.Array):
    """Returns (dx, dy) forward differences, shapes shrink by 1 on that axis."""
    dy = d[:, 1:, :, :] - d[:, :-1, :, :]
    dx = d[:, :, 1:, :] - d[:, :, :-1, :]
    return dx, dy


def edge_aware_smoothness(disp: jax.Array, img: jax.Array) -> jax.Array:
    """disp: (B,h,w,1); img: (B,H,W,3) full-res (area-downsampled here)."""
    b, h, w, _ = disp.shape
    img = resize_area(img, h, w)
    a1 = a2 = 0.5

    disp_dx, disp_dy = _grad(disp)
    img_dx, img_dy = _grad(img)
    disp_dxx, disp_dxy = _grad(disp_dx)
    disp_dyx, disp_dyy = _grad(disp_dy)
    img_dxx, img_dxy = _grad(img_dx)
    img_dyx, img_dyy = _grad(img_dy)

    def term(dd, di, a):
        gate = jnp.exp(-a * jnp.abs(di).mean(axis=-1, keepdims=True))
        return jnp.mean(jnp.abs(dd) * gate)

    smooth1 = term(disp_dx, img_dx, a1) + term(disp_dy, img_dy, a1)
    smooth2 = (
        term(disp_dxx, img_dxx, a2)
        + term(disp_dxy, img_dxy, a2)
        + term(disp_dyx, img_dyx, a2)
        + term(disp_dyy, img_dyy, a2)
    )
    return smooth1 + smooth2
