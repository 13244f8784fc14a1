"""Image sampling & warping kernels (gather-based, XLA-fusable).

Replaces the library kernels the reference delegates to — `F.grid_sample`
(`net.py:701`), `torchgeometry.warp_perspective` (`net.py:285-289`) and
`F.interpolate` — with pure-JAX formulations built around a single
packed-patch gather (see `grid_sample`) that XLA fuses with the
surrounding elementwise work.

All images are NHWC.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Row count above which grid_sample uses the x-grouped wide-row gather
# (tests lower this to exercise the grouped path on small images).
_GROUP_MIN_ROWS = 1 << 20
# x-positions packed per gather row (row width = _GROUP_WIDTH x 16 lanes).
# 8 (=128-lane rows) measured fastest on v5e; benches monkeypatch this to
# probe wider rows.
_GROUP_WIDTH = 8
# Experimental (bench-monkeypatched): optimization_barrier placement in the
# grouped gather path, probing whether XLA will re-lay the small select
# output instead of the full-width gather output (the 2x1.93 ms copies in
# the round-5 audit). "" = off, "sel" = after the within-group select,
# "out" = on the lerp outputs.
_SELECT_BARRIER = ""


def _take_rows(flat: jax.Array, idx: jax.Array) -> jax.Array:
    """(M, K) rows at in-bounds indices of any shape S -> (*S, K).

    lax.gather with PROMISE_IN_BOUNDS: `jnp.take`'s modes all insert an
    index fixup or an OOB select over the full gather output. The output
    shape comes straight from the gather dimension numbers — reshaping a
    (N, K) gather result to (B, Ho, Wo, K) afterwards cost a 1 GB layout
    copy at 1024^2.
    """
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(idx.ndim,), collapsed_slice_dims=(0,),
        start_index_map=(0,))
    return jax.lax.gather(
        flat, idx[..., None], dimension_numbers=dnums,
        slice_sizes=(1, flat.shape[1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def grid_sample(
    img: jax.Array,
    grid: jax.Array,
    padding_mode: str = "border",
    align_corners: bool = True,
    tap_dtype=None,
    img_grad: bool = True,
) -> jax.Array:
    """Bilinear sampling of `img` at normalized `grid` locations.

    Matches `torch.nn.functional.grid_sample` semantics for NHWC inputs.
    The reference's photometric warp runs the (old-torch) align_corners=True
    convention — its `Project` normalizes by (W-1, H-1) (`layers.py:79-81`).

    TPU formulation: ONE gather of 2x2-patch rows instead of four per-corner
    gathers. TPU gathers move whole lane-rows per index, so a 3-channel
    image wastes 125/128 lanes per tap; packing the four taps into a 4C-wide
    patch tensor (built from fused shifted copies) cuts gather transactions
    4x and measured ~17x wall-clock on v5e vs the naive form.

    `img_grad=False` declares the image a constant (true for the
    photometric warps: the sampled frames are input data) and switches to a
    custom VJP that saves only the two analytic grid-tangent fields
    (d out/d fx, d out/d fy — each (B, Ho, Wo, C)) instead of the gathered
    taps + lerp weights: at the flagship config plain autodiff keeps ~1 GB
    of gather-output residuals alive for the backward pass; the tangents
    are ~50 MB and the backward collapses to one small contraction.
    Gradients are the exact same analytic expressions autodiff produces
    (floor is piecewise-constant; clamp masks replicated).

    Args:
      img:  (B, H, W, C).
      grid: (B, Ho, Wo, 2) with grid[..., 0]=x, grid[..., 1]=y in [-1, 1].
      padding_mode: "border" or "zeros".
    Returns:
      (B, Ho, Wo, C).
    """
    if padding_mode not in ("border", "zeros"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    if not img_grad:
        return _grid_sample_const_img(
            img, grid, padding_mode, align_corners, tap_dtype)
    return _gs_impl(img, grid, padding_mode, align_corners, tap_dtype, False)[0]


def _gs_impl(
    img: jax.Array,
    grid: jax.Array,
    padding_mode: str,
    align_corners: bool,
    tap_dtype,
    want_tangents: bool,
):
    """Shared grid_sample body; optionally also emits the analytic grid
    tangents d out/d gx, d out/d gy (already chained through the pixel
    scaling and clamp masks, so the backward is just sum_c(g * tangent))."""
    b, h, w, c = img.shape
    _, ho, wo, _ = grid.shape
    dtype = img.dtype
    n = ho * wo

    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        sx, sy = 0.5 * (w - 1), 0.5 * (h - 1)
        fx = (gx + 1.0) * sx
        fy = (gy + 1.0) * sy
    else:
        sx, sy = 0.5 * w, 0.5 * h
        fx = (gx + 1.0) * sx - 0.5
        fy = (gy + 1.0) * sy - 0.5

    if padding_mode == "border":
        # Border mode == sampling at coordinates clamped to the image box;
        # clamping the *continuous* coords keeps the lerp weights exact.
        # Tangent masks replicate the clamp's autodiff (grad passes at the
        # boundary itself, lax.max/min tie rules).
        if want_tangents:
            mx = (fx >= 0.0) & (fx <= w - 1.0)
            my = (fy >= 0.0) & (fy <= h - 1.0)
        fx = jnp.clip(fx, 0.0, w - 1.0)
        fy = jnp.clip(fy, 0.0, h - 1.0)
        src = img
        shift = 0
        hi_x, hi_y = w - 1, h - 1  # base-tap clamp (right tap replicated)
    else:
        # Zeros mode: a 2-pixel zero ring makes every corner case exact
        # with plain index clamping — straddling taps read the zero ring,
        # far-out coords clamp fully into it. No masks needed (tangents of
        # fully-out-of-range samples vanish through the all-zero taps).
        if want_tangents:
            mx = my = None
        src = jnp.pad(img, ((0, 0), (2, 2), (2, 2), (0, 0)))
        shift = 2
        hi_x, hi_y = w + 2, h + 2

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    # The gather below runs flat-2D (B*N rows, batch folded into the row
    # index) and its output is viewed as a (B, Ho, Wo, K) NHWC image — a
    # free bitcast of the row-major gather layout. Working in any OTHER
    # view made XLA's layout assignment bridge the (N, K) gather layout
    # with physical copies of the full 1 GB output (13 ms/step at 1024^2);
    # in this form only the final (B, Ho, Wo, C) lerp result is re-laid.
    wx = (fx - x0)[..., None].astype(dtype)  # (B, Ho, Wo, 1)
    wy = (fy - y0)[..., None].astype(dtype)
    x0i = jnp.clip(x0 + shift, 0, hi_x).astype(jnp.int32)
    y0i = jnp.clip(y0 + shift, 0, hi_y).astype(jnp.int32)

    sh, sw = src.shape[1], src.shape[2]
    # Optional low-precision taps: photometric sources are 8-bit images
    # (quantization 1/255 ≈ 0.4%), so bfloat16 taps lose nothing while
    # halving gather traffic AND the residual XLA saves for the backward
    # pass. Lerp weights and the blend stay in the image dtype.
    # uint8 taps go further: the loader's images are EXACTLY k/255 (PIL
    # uint8 ops + /255, data/transforms.py), so round(src*255) recovers
    # the source bytes losslessly, the gather moves 1-byte lanes (half of
    # bf16), and the lerp runs on exact taps in the image dtype — strictly
    # better numerics than bf16 taps for 8-bit-exact sources.
    tap_q = 1.0
    if tap_dtype is not None and jnp.dtype(tap_dtype) == jnp.uint8:
        src = jnp.round(
            jnp.clip(src.astype(jnp.float32), 0.0, 1.0) * 255.0
        ).astype(jnp.uint8)
        tap_q = 1.0 / 255.0
    elif tap_dtype is not None:
        src = src.astype(tap_dtype)
    # Patch tensor: (B, sh, sw, 4C) rows = [p00 | p01 | p10 | p11] with
    # edge-replicated shifts (all fused elementwise by XLA).
    right = jnp.concatenate([src[:, :, 1:], src[:, :, -1:]], axis=2)
    down = jnp.concatenate([src[:, 1:], src[:, -1:]], axis=1)
    downright = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    patch = jnp.concatenate([src, right, down, downright], axis=-1)

    # Group 8 consecutive x-positions per gather row: v5e gathers wide rows
    # far faster than narrow ones (measured in-program 7.8 ms vs 29.6 ms
    # for the 4.2M-row photometric gather), because a 4C=12-lane row leaves
    # 116/128 output lanes padding. Row = (8 x-positions) x 16-lane patch =
    # 128 lanes; the within-row tap is selected afterwards by a fused 8-way
    # masked sum. The shifted-copy patch construction keeps taps straddling
    # a group boundary exact. Only a win for big row counts — small warps
    # (CGT labels) lose to the select overhead and gather directly. The
    # batch dim is folded into the row index so the gather stays flat-2D on
    # the operand side (see _take_rows for the in-bounds/ND-output story).
    grp = _GROUP_WIDTH if n >= _GROUP_MIN_ROWS else 1
    boff = (jnp.arange(b, dtype=jnp.int32) * sh)[:, None, None]  # row blocks
    if grp > 1:
        # Pad each position's 4C patch to a 16-lane stride: slicing the
        # gather output at 12-lane offsets re-tiled it (one 2.8 ms copy of
        # the 800 MB output per frame); 16-lane-aligned slices are free and
        # the row becomes exactly 128 lanes.
        cs = -(-4 * c // 16) * 16
        if cs != 4 * c:
            patch = jnp.pad(patch, ((0, 0),) * 3 + ((0, cs - 4 * c),))
        sw8 = -(-sw // grp)
        if sw8 * grp != sw:
            patch = jnp.pad(
                patch, ((0, 0), (0, 0), (0, sw8 * grp - sw), (0, 0)))
        flat = patch.reshape(b * sh * sw8, grp * cs)
        idx = (y0i + boff) * sw8 + x0i // grp  # (B, Ho, Wo)
        sub = (x0i % grp)[..., None]  # (B, Ho, Wo, 1)
        g = _take_rows(flat, idx)  # (B, Ho, Wo, 8*cs)
        g4 = g[..., : 4 * c] * 0
        for k in range(grp):
            g4 = g4 + jnp.where(
                sub == k, g[..., k * cs:k * cs + 4 * c], 0)
        if _SELECT_BARRIER == "sel":
            g4 = jax.lax.optimization_barrier(g4)
    else:
        flat = patch.reshape(b * sh * sw, 4 * c)
        idx = (y0i + boff) * sw + x0i  # (B, Ho, Wo)
        g4 = _take_rows(flat, idx)  # (B, Ho, Wo, 4C)
    # Slice the four taps out of the 4C lane dim (fused, layout-preserving)
    # rather than reshaping to (..., 4, C) — that reshape re-tiles the 50M-
    # element gather output and costs a physical copy per tap at 1024^2.
    v00, v01, v10, v11 = (g4[..., i * c:(i + 1) * c] for i in range(4))
    if tap_q != 1.0:
        # Promote u8 taps before any arithmetic: the tangents below take
        # tap DIFFERENCES, which wrap in uint8. 0..255 is exact in every
        # float dtype; the dequant scale is folded in at the end.
        v00, v01, v10, v11 = (v.astype(dtype) for v in (v00, v01, v10, v11))

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    if tap_q != 1.0:  # uint8 taps: one dequant multiply on the lerp result
        out = out * jnp.asarray(tap_q, out.dtype)
    if _SELECT_BARRIER == "out":
        out = jax.lax.optimization_barrier(out)
    if not want_tangents:
        return out, None, None
    # Analytic d out/d fx, d out/d fy (floor/index paths are
    # piecewise-constant, exactly as autodiff treats them), chained through
    # the pixel scaling and clamp masks so the backward needs ONLY these
    # two fields: d out/d gx = sx * mask * ((v01-v00)(1-wy) + (v11-v10) wy).
    fxs = jnp.asarray(sx * tap_q, out.dtype)  # tap_q folds the u8 dequant
    fys = jnp.asarray(sy * tap_q, out.dtype)
    if mx is not None:
        fxs = fxs * mx[..., None].astype(out.dtype)
        fys = fys * my[..., None].astype(out.dtype)
    dgx = ((v01 - v00) * (1 - wy) + (v11 - v10) * wy) * fxs
    dgy = (bot - top) * fys
    return out, dgx, dgy


@functools.lru_cache(maxsize=64)
def _const_img_gs_fn(padding_mode, align_corners, tap_dtype_name,
                     img_shape, img_dtype_name, grid_dtype_name):
    """custom_vjp grid_sample specialization (static config via cache key —
    residual pytrees may only hold arrays, so shapes/dtypes live here).
    Bounded cache: a fixed-shape trainer uses a handful of entries; a
    variable-resolution caller must not grow closures without limit."""
    tap_dtype = jnp.dtype(tap_dtype_name) if tap_dtype_name else None
    img_dtype = jnp.dtype(img_dtype_name)
    grid_dtype = jnp.dtype(grid_dtype_name)

    @jax.custom_vjp
    def f(img, grid):
        return _gs_impl(img, grid, padding_mode, align_corners,
                        tap_dtype, False)[0]

    def fwd(img, grid):
        out, dgx, dgy = _gs_impl(
            img, grid, padding_mode, align_corners, tap_dtype, True)
        return out, (dgx, dgy)

    def bwd(res, g):
        dgx, dgy = res
        gf = g.astype(jnp.float32)
        cgx = jnp.sum(gf * dgx.astype(jnp.float32), axis=-1)
        cgy = jnp.sum(gf * dgy.astype(jnp.float32), axis=-1)
        cgrid = jnp.stack([cgx, cgy], axis=-1).astype(grid_dtype)
        return jnp.zeros(img_shape, img_dtype), cgrid

    f.defvjp(fwd, bwd)
    return f


def _grid_sample_const_img(img, grid, padding_mode, align_corners, tap_dtype):
    """grid_sample with the image declared constant (no image cotangent)."""
    fn = _const_img_gs_fn(
        padding_mode, align_corners,
        jnp.dtype(tap_dtype).name if tap_dtype is not None else None,
        tuple(img.shape), jnp.dtype(img.dtype).name,
        jnp.dtype(grid.dtype).name)
    return fn(img, grid)


def grid_sample_multi(
    img: jax.Array,
    grids: jax.Array,
    padding_mode: str = "border",
    align_corners: bool = True,
    tap_dtype=None,
    img_grad: bool = True,
) -> jax.Array:
    """Sample ONE image at S independent grids with a single gather.

    Equivalent to stacking `grid_sample(img, grids[:, s])` over s, but the
    2x2-patch tensor is built once and the S*Ho*Wo indices ride one gather
    — the multi-scale photometric pyramid samples each source frame at 4
    grids, and gather setup/transactions dominate its cost.

    Args:
      img: (B, H, W, C); grids: (B, S, Ho, Wo, 2).
    Returns:
      (B, S, Ho, Wo, C).
    """
    b, s, ho, wo, _ = grids.shape
    flat = grids.reshape(b, s * ho, wo, 2)
    out = grid_sample(img, flat, padding_mode, align_corners, tap_dtype,
                      img_grad=img_grad)
    return out.reshape(b, s, ho, wo, img.shape[-1])


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
    loss uses (`net.py:762`). Two separable 1-D `reduce_window` sums
    instead of a reshape+mean: the (H, fh, W, fw, C) reshape physically
    retiled the planar C=3 image (1.2 ms + a 1.1 ms reduce at 1024² fp32,
    round-3 trace) where the windowed reductions stream it.
    """
    b, h, w, c = img.shape
    if (h, w) == (out_h, out_w):
        return img
    fh, fw = h // out_h, w // out_w
    assert fh * out_h == h and fw * out_w == w, (
        f"resize_area requires integer factors, got {h}x{w} -> {out_h}x{out_w}"
    )
    x = jax.lax.reduce_window(
        img, jnp.zeros((), img.dtype), jax.lax.add,
        (1, fh, 1, 1), (1, fh, 1, 1), "VALID")
    x = jax.lax.reduce_window(
        x, jnp.zeros((), img.dtype), jax.lax.add,
        (1, 1, fw, 1), (1, 1, fw, 1), "VALID")
    return x * (1.0 / (fh * fw))
