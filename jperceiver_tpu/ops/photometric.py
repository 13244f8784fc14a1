"""Photometric reprojection losses (monodepth2-style)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ssim import ssim


def robust_l1(pred: jax.Array, target: jax.Array, eps: float = 1e-3) -> jax.Array:
    """Charbonnier residual, parity with `net.py:84-86`."""
    return jnp.sqrt((target - pred) ** 2 + eps * eps)


def reprojection_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """0.85*SSIM + 0.15*robust-L1, channel-averaged -> (B, H, W, 1).

    Parity with `net.py:88-92`.
    """
    photo = robust_l1(pred, target).mean(axis=-1, keepdims=True)
    struct = ssim(pred, target).mean(axis=-1, keepdims=True)
    return 0.85 * struct + 0.15 * photo
