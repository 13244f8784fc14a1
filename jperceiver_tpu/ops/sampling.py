"""Image sampling & warping kernels (gather-based, XLA-fusable).

Replaces the library kernels the reference delegates to — `F.grid_sample`
(`net.py:701`), `torchgeometry.warp_perspective` (`net.py:285-289`) and
`F.interpolate` — with pure-JAX formulations: four `take_along_axis` gathers
plus a lerp. XLA lowers these to TPU gathers fused with the surrounding
elementwise work; a Pallas variant only pays off if profiling shows the
gathers dominating (see `ops/pallas/`).

All images are NHWC.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather_pixels(img_flat: jax.Array, idx: jax.Array) -> jax.Array:
    """img_flat: (B, H*W, C); idx: (B, N) int32 -> (B, N, C)."""
    return jnp.take_along_axis(img_flat, idx[..., None], axis=1)


def grid_sample(
    img: jax.Array,
    grid: jax.Array,
    padding_mode: str = "border",
    align_corners: bool = True,
) -> jax.Array:
    """Bilinear sampling of `img` at normalized `grid` locations.

    Matches `torch.nn.functional.grid_sample` semantics for NHWC inputs.
    The reference's photometric warp runs the (old-torch) align_corners=True
    convention — its `Project` normalizes by (W-1, H-1) (`layers.py:79-81`).

    Args:
      img:  (B, H, W, C).
      grid: (B, Ho, Wo, 2) with grid[..., 0]=x, grid[..., 1]=y in [-1, 1].
      padding_mode: "border" or "zeros".
    Returns:
      (B, Ho, Wo, C).
    """
    b, h, w, c = img.shape
    _, ho, wo, _ = grid.shape
    dtype = img.dtype

    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = (gx + 1.0) * 0.5 * w - 0.5
        fy = (gy + 1.0) * 0.5 * h - 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0

    def clip_x(v):
        return jnp.clip(v, 0, w - 1)

    def clip_y(v):
        return jnp.clip(v, 0, h - 1)

    x0i = clip_x(x0).astype(jnp.int32)
    x1i = clip_x(x0 + 1).astype(jnp.int32)
    y0i = clip_y(y0).astype(jnp.int32)
    y1i = clip_y(y0 + 1).astype(jnp.int32)

    flat = img.reshape(b, h * w, c)
    n = ho * wo

    def flat_idx(yi, xi):
        return (yi * w + xi).reshape(b, n)

    v00 = _gather_pixels(flat, flat_idx(y0i, x0i))
    v01 = _gather_pixels(flat, flat_idx(y0i, x1i))
    v10 = _gather_pixels(flat, flat_idx(y1i, x0i))
    v11 = _gather_pixels(flat, flat_idx(y1i, x1i))

    wx = wx.reshape(b, n, 1).astype(dtype)
    wy = wy.reshape(b, n, 1).astype(dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy

    if padding_mode == "zeros":
        # A corner contributes only when it falls inside the image; replicate
        # torch's per-corner masking so edge pixels blend with zero outside.
        def inside(yf, xf):
            return (
                (xf >= 0) & (xf <= w - 1) & (yf >= 0) & (yf <= h - 1)
            ).reshape(b, n, 1).astype(dtype)

        m00 = inside(y0, x0)
        m01 = inside(y0, x0 + 1)
        m10 = inside(y0 + 1, x0)
        m11 = inside(y0 + 1, x0 + 1)
        top = v00 * m00 * (1 - wx) + v01 * m01 * wx
        bot = v10 * m10 * (1 - wx) + v11 * m11 * wx
        out = top * (1 - wy) + bot * wy
    elif padding_mode != "border":
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    return out.reshape(b, ho, wo, c)


def warp_perspective(
    src: jax.Array,
    M: jax.Array,
    dsize: tuple[int, int],
    padding_mode: str = "zeros",
) -> jax.Array:
    """Perspective warp: dst(p) = src(M^{-1} @ p) in pixel coordinates.

    Semantics of `torchgeometry.core.imgwarp.warp_perspective` as used by the
    CGT label synthesis (`net.py:285-289`): the reference always passes
    `M = inv(H)` so the effective sampling map is `H` itself; we invert here
    to keep the public contract identical.

    Args:
      src: (B, H, W, C); M: (B, 3, 3); dsize: (out_h, out_w).
    """
    out_h, out_w = dsize
    b, h, w, _ = src.shape
    Minv = jnp.linalg.inv(M.astype(jnp.float32))

    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    ones = jnp.ones((out_h, out_w), jnp.float32)
    pix = jnp.stack([xs, ys, ones], axis=0).reshape(3, out_h * out_w)

    q = jnp.einsum("bij,jn->bin", Minv, pix, precision=jax.lax.Precision.HIGHEST)  # (B, 3, N)
    q = q[:, :2] / (q[:, 2:3] + 1e-8)
    # Normalize to [-1, 1] with the align-corners convention ((W-1) scaling),
    # matching torchgeometry's normal_transform_pixel.
    sx = 2.0 / max(w - 1, 1)
    sy = 2.0 / max(h - 1, 1)
    gx = q[:, 0] * sx - 1.0
    gy = q[:, 1] * sy - 1.0
    grid = jnp.stack([gx, gy], axis=-1).reshape(b, out_h, out_w, 2)
    return grid_sample(src, grid, padding_mode=padding_mode, align_corners=True)


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize, half-pixel centers (torch align_corners=False)."""
    b, _, _, c = img.shape
    return jax.image.resize(img, (b, out_h, out_w, c), method="bilinear")


def resize_nearest(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    b, _, _, c = img.shape
    return jax.image.resize(img, (b, out_h, out_w, c), method="nearest")


def upsample2x_nearest(img: jax.Array) -> jax.Array:
    """x2 nearest-neighbour upsample (`F.interpolate(scale_factor=2)`).

    Phrased as broadcast+reshape (no gather) so XLA fuses it into the
    following conv's input.
    """
    b, h, w, c = img.shape
    img = img[:, :, None, :, None, :]
    img = jnp.broadcast_to(img, (b, h, 2, w, 2, c))
    return img.reshape(b, 2 * h, 2 * w, c)


def resize_area(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Area (average-pool) downsample for integer factors.

    Matches `F.interpolate(mode='area')` for the integer ratios the smooth
    loss uses (`net.py:762`).
    """
    b, h, w, c = img.shape
    fh, fw = h // out_h, w // out_w
    assert fh * out_h == h and fw * out_w == w, (
        f"resize_area requires integer factors, got {h}x{w} -> {out_h}x{out_w}"
    )
    x = img.reshape(b, out_h, fh, out_w, fw, c)
    return x.mean(axis=(2, 4))
