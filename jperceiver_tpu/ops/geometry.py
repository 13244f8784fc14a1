"""Differentiable camera / rigid-body geometry primitives.

TPU-first re-design of the reference geometry layer
(`/root/reference/mono/model/mono_baseline/layers.py:33-107,214-304` and
`net.py:477-543,690-756`): everything is a pure function on batched arrays,
shapes are static, and the per-pixel work is phrased as large batched matmuls
(MXU-friendly) instead of cached `nn.Module` buffers.

Conventions
-----------
* Images are NHWC.
* Intrinsics `K` are 4x4 (padded) or 3x3; poses `T` are (B, 4, 4).
* Pixel grids use `(x, y)` ordering like the reference, with `x` the column.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Small pose/intrinsics matmuls must not run in the TPU's default bf16
# matmul precision — a 4x4 pose quantized to bf16 wrecks the photometric
# warp. All matmuls in this module use full fp32 accumulation.
_HIGHEST = jax.lax.Precision.HIGHEST
_matmul = functools.partial(jnp.matmul, precision=_HIGHEST)
_einsum = functools.partial(jnp.einsum, precision=_HIGHEST)


def disp_to_depth(disp: jax.Array, min_depth: float, max_depth: float):
    """Sigmoid disparity -> (scaled_disp, depth).

    Mirrors `layers.py:33-38`: depth = 1 / (1/max + (1/min - 1/max) * disp).
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def rot_from_axisangle(vec: jax.Array) -> jax.Array:
    """Axis-angle (B, 3) -> rotation matrix (B, 4, 4) (Rodrigues).

    Behavioural parity with `net.py:727-756`.
    """
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # (B, 1)
    axis = vec / (angle + 1e-7)
    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    c1 = 1.0 - ca
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xc, yc, zc = x * c1, y * c1, z * c1
    xyc, yzc, zxc = x * yc, y * zc, z * xc

    rot = jnp.stack(
        [
            x * xc + ca, xyc - zs, zxc + ys,
            xyc + zs, y * yc + ca, yzc - xs,
            zxc - ys, yzc + xs, z * zc + ca,
        ],
        axis=-1,
    ).reshape(vec.shape[0], 3, 3)
    out = jnp.zeros((vec.shape[0], 4, 4), dtype=vec.dtype)
    out = out.at[:, :3, :3].set(rot)
    out = out.at[:, 3, 3].set(1.0)
    return out


def _translation_matrix(t: jax.Array) -> jax.Array:
    """(B, 3) -> homogeneous (B, 4, 4) translation."""
    b = t.shape[0]
    out = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), (b, 4, 4))
    return out.at[:, :3, 3].set(t)


def transformation_from_parameters(
    axisangle: jax.Array, translation: jax.Array, invert: bool = False
) -> jax.Array:
    """(axis-angle, translation) -> SE3 matrix (B, 4, 4).

    Parity with `net.py:704-715`: forward is T @ R; inverted is R^T @ T(-t).
    """
    r = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        r = jnp.swapaxes(r, 1, 2)
        t = -t
    tm = _translation_matrix(t)
    return _matmul(r, tm) if invert else _matmul(tm, r)


def se3_matrix(rotation: jax.Array, translation: jax.Array) -> jax.Array:
    """(B,3,3) rotation + (B,3) translation -> (B,4,4) homogeneous."""
    b = rotation.shape[0]
    out = jnp.broadcast_to(jnp.eye(4, dtype=rotation.dtype), (b, 4, 4))
    out = out.at[:, :3, :3].set(rotation)
    out = out.at[:, :3, 3].set(translation)
    return out


def se3_inverse(mat: jax.Array) -> jax.Array:
    """Inverse of batched rigid transforms (B,4,4) without a linear solve."""
    r = jnp.swapaxes(mat[..., :3, :3], -1, -2)
    t = -_einsum("...ij,...j->...i", r, mat[..., :3, 3])
    return se3_matrix(r, t)


def se3_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """a @ b for batched (B,4,4) rigid transforms."""
    return _matmul(a, b)


def ground_homography(camera_T_ground: jax.Array, K: jax.Array) -> jax.Array:
    """Homography image <- ground plane (Hartley-Zisserman 8.1.1).

    `img_H_ground = K @ [r1 | r2 | t]` — parity with `net.py:529-543`.

    Args:
      camera_T_ground: (B, 4, 4) SE3 of the ground frame in camera coords.
      K: (B, 3, 3) intrinsics.
    Returns:
      (B, 3, 3) homography mapping ground-plane (x, y, 1) to image pixels.
    """
    cols = jnp.stack(
        [
            camera_T_ground[:, :3, 0],
            camera_T_ground[:, :3, 1],
            camera_T_ground[:, :3, 3],
        ],
        axis=-1,
    )  # (B, 3, 3)
    return _matmul(K, cols)


def _pixel_grid(height: int, width: int, dtype=jnp.float32) -> jax.Array:
    """Homogeneous pixel grid (3, H*W) with (x, y, 1) rows.

    Built from `broadcasted_iota` so it constant-folds under jit; replaces the
    cached `Backproject.pix_coords` buffer of `layers.py:41-55`.
    """
    xs = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    ys = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    ones = jnp.ones((height, width), dtype)
    return jnp.stack([xs, ys, ones], axis=0).reshape(3, height * width)


def backproject(depth: jax.Array, inv_K: jax.Array) -> jax.Array:
    """Depth map -> homogeneous camera-frame points.

    Args:
      depth: (B, H, W, 1) depth.
      inv_K: (B, 4, 4) inverse intrinsics (only the 3x3 block is used).
    Returns:
      (B, 4, H*W) points, parity with `layers.py:57-61`.
    """
    b, h, w, _ = depth.shape
    pix = _pixel_grid(h, w, depth.dtype)  # (3, N)
    rays = _einsum("bij,jn->bin", inv_K[:, :3, :3], pix)  # (B, 3, N)
    pts = depth.reshape(b, 1, h * w) * rays
    ones = jnp.ones((b, 1, h * w), depth.dtype)
    return jnp.concatenate([pts, ones], axis=1)


def project(points: jax.Array, K: jax.Array, T: jax.Array, height: int, width: int,
            eps: float = 1e-7) -> jax.Array:
    """Project camera points through pose T into normalized sampling coords.

    Args:
      points: (B, 4, N) homogeneous points with N = height*width.
      K: (B, 4, 4) intrinsics; T: (B, 4, 4) camera motion.
    Returns:
      (B, H, W, 2) grid in [-1, 1] ((x, y), align-corners convention), parity
      with `layers.py:64-82`.
    """
    b = points.shape[0]
    P = _matmul(K, T)[:, :3, :]  # (B, 3, 4)
    cam = _einsum("bij,bjn->bin", P, points)  # (B, 3, N)
    xy = cam[:, :2] / (cam[:, 2:3] + eps)
    xy = xy.reshape(b, 2, height, width).transpose(0, 2, 3, 1)
    scale = jnp.asarray([width - 1, height - 1], xy.dtype)
    return (xy / scale - 0.5) * 2.0
