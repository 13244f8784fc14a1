"""Fused photometric reprojection loss (SSIM+Charbonnier+frame-min), Pallas.

Target: the hot per-scale `min_f(0.85*SSIM + 0.15*charbonnier)` stack of
the multi-task loss (`losses/multitask.py`, parity `net.py:88-92,169-175`).
The XLA lowering materializes fp32 window-statistic fields per warped pair
(5 windowed sums x S*F pairs at full resolution) plus per-pair loss maps;
this kernel reads each pred strip once, keeps every intermediate in VMEM,
and writes only the min-over-frames map per (scale, batch). The backward
recomputes blockwise and differentiates the block closure with `jax.grad`
INSIDE the kernel (Pallas kernels trace ordinary JAX), so no statistic
fields are ever saved or re-read from HBM.

Layout: channels-planar `(S, B, F, C, H+4, W+4)` so W rides the lane
dimension (channel-last C=3 would waste 125/128 lanes; every 3x3 window
shift is then a static sublane/lane slice). H and W are pre-padded on the
XLA side with the SSIM reflect ring (1px) plus one zero ring for the
backward halo; blocks overlap via `pl.Element` row indexing.

Backward decomposition: a pixel's gradient needs the 3x3 window
statistics of its neighbors, so interior gradients come from the kernel
(cot halo of 1 stat row per block; first-block/last-block stat rows
outside the image carry zero cotangent and vanish). The two reflect-ring
rows/cols (padded row/col 1 and H+2/W+2) are copies of image row/col 1
and H-2/W-2; their gradients flow through exactly ONE live statistic line
(stat row/col 0 or H-1/W-1), so the XLA wrapper computes them as
`jax.grad` of 3-wide strip closures and folds them back — with the four
corner stats subtracted once, since the row and column strips both
include them. Grad-parity vs plain autodiff of the pure chain is exact
(`tests/test_pallas_reproj.py`).

Tie semantics match XLA: the frame-min is built from `jnp.minimum`, so
both paths split cotangents identically at ties; the SSIM clip passes
gradient on the closed interval.

Gated by `cfg.use_pallas_reproj` — default "auto" = ON for the TPU
backend with bf16 operands since round 4 (whole-step-measured 11.28 vs
10.80 f/s at the flagship config, `losses/multitask.py`; landed per the
Pallas-conv precedent in DESIGN.md: standalone wins only count once a
full `bench.py` run on the real chip confirms them), OFF elsewhere (the
CPU interpret path exists for parity tests only).

Data parallelism: a bare `pallas_call` carries no GSPMD partitioning
rule, so under a batch-sharded step the compiler would all-gather the
warped stack and run the kernel replicated (the CPU interpret backend
deadlocks its collective rendezvous outright). Both kernels are therefore
wrapped in `jax.experimental.custom_partitioning` shard-over-(S, B)
rules — the grid already treats (scale, batch) blocks independently, so
each device simply runs the kernel on its local batch shard; H/W/F/C
shardings are forced replicated. (`use_pallas_conv` has no such wrapper —
that knob remains single-chip.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pragma: no cover - optional dependency guard
    from jax.experimental import pallas as pl

    HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS = False


def _interpret() -> bool:
    return jax.default_backend() == "cpu"

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2
_SSIM_W = 0.85
_L1_W = 0.15
_EPS = 1e-3  # charbonnier epsilon (`net.py:84-86`)


# --------------------------------------------------------------------------
# Shared block math (used by the kernels AND the strip/parity closures).
# Arrays are channel-planar: pred/targ (..., C, H', W').


def _win3(x, lo_h, n_h, lo_w, n_w):
    """3x3 window sums: entry (k, l) sums x[lo_h+k : lo_h+k+3,
    lo_w+l : lo_w+l+3] -> (..., n_h, n_w). Static slices only,
    SEPARABLE (3 row shifts then 3 col shifts — 6 slices/4 adds instead
    of the naive 9/8; less Mosaic IR and fewer VPU ops)."""
    rs = None
    for dy in range(3):
        t = x[..., lo_h + dy:lo_h + dy + n_h, lo_w:lo_w + n_w + 2]
        rs = t if rs is None else rs + t
    acc = None
    for dx in range(3):
        t = rs[..., :, dx:dx + n_w]
        acc = t if acc is None else acc + t
    return acc


def _targ_stats(targ, lo_h, n_h, lo_w, n_w):
    """Per-channel (mu_y, sigma_y, ys) of the target — frame-invariant,
    so `_min_rl` computes them ONCE instead of per warped frame."""
    out = []
    for ci in range(targ.shape[0]):
        ys = targ[ci].astype(jnp.float32)
        mu_y = _win3(ys, lo_h, n_h, lo_w, n_w) * (1.0 / 9.0)
        sigma_y = _win3(ys * ys, lo_h, n_h, lo_w, n_w) * (1.0 / 9.0) - mu_y * mu_y
        out.append((mu_y, sigma_y, ys))
    return out


def _rl_grid(pred, targ, lo_h, n_h, lo_w, n_w, tstats=None):
    """Per-pixel reprojection loss on a stats grid.

    pred/targ: (C, H', W') (any float dtype; stats run fp32). Stat (k, l)
    windows rows lo_h+k..+2 / cols lo_w+l..+2; the charbonnier term uses
    the window center. Returns (n_h, n_w) fp32.
    """
    c = pred.shape[0]
    if tstats is None:
        tstats = _targ_stats(targ, lo_h, n_h, lo_w, n_w)
    acc = None
    for ci in range(c):
        xs = pred[ci].astype(jnp.float32)
        mu_y, sigma_y, ys = tstats[ci]
        mu_x = _win3(xs, lo_h, n_h, lo_w, n_w) * (1.0 / 9.0)
        sigma_x = _win3(xs * xs, lo_h, n_h, lo_w, n_w) * (1.0 / 9.0) - mu_x * mu_x
        sigma_xy = _win3(xs * ys, lo_h, n_h, lo_w, n_w) * (1.0 / 9.0) - mu_x * mu_y
        num = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
        den = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
        s = jnp.clip((1.0 - num / den) * 0.5, 0.0, 1.0)
        d = (ys[lo_h + 1:lo_h + 1 + n_h, lo_w + 1:lo_w + 1 + n_w]
             - xs[lo_h + 1:lo_h + 1 + n_h, lo_w + 1:lo_w + 1 + n_w])
        ch = jnp.sqrt(d * d + _EPS * _EPS)
        t = _SSIM_W * s + _L1_W * ch
        acc = t if acc is None else acc + t
    return acc * (1.0 / c)


def _min_rl(preds, targ, lo_h, n_h, lo_w, n_w):
    """min over the leading frame dim of `_rl_grid`. preds (F, C, H', W')."""
    tstats = _targ_stats(targ, lo_h, n_h, lo_w, n_w)
    best = None
    for f in range(preds.shape[0]):
        rl = _rl_grid(preds[f], targ, lo_h, n_h, lo_w, n_w, tstats)
        best = rl if best is None else jnp.minimum(best, rl)
    return best


# --------------------------------------------------------------------------
# Kernels.


def _fwd_kernel(p_ref, t_ref, o_ref):
    # p (1, 1, 1, F, C, rows+8, Wp), t (1, 1, C, rows+8, Wp),
    # o (1, 1, rows, W). Each block reads its own pre-materialized halo'd
    # row strip (strips are DISJOINT along the strip axis — overlapping
    # `pl.Element` halo blocks crash the Mosaic compiler outright at
    # multi-block grids, with no diagnostic; see `_row_strips`). Strips
    # carry rows+8 sublanes (8-divisible); only rows+4 are live.
    rows, w = o_ref.shape[2], o_ref.shape[3]
    o_ref[0, 0] = _min_rl(p_ref[0, 0, 0], t_ref[0, 0], 1, rows, 1, w)


def _bwd_kernel(p_ref, t_ref, cz_ref, o_ref):
    # cz (1, 1, 1, rows+8, W+2): cotangent strip incl. a 1-stat halo (zero
    # at the image border; rows beyond rows+2 are dead pad for the TPU's
    # 8-divisible sublane block constraint); o (1, 1, F, C, rows, W):
    # interior pred gradients. Strips are disjoint (see _fwd_kernel).
    #
    # The naive `jax.grad` of the whole block closure crashes Mosaic (the
    # window-sum SLICE TRANSPOSES lower to unaligned-lane accumulate
    # stores; tpu_compile_helper exits 1 even at tiny shapes). Split
    # instead: jax.grad covers ONLY the pointwise stats->loss map (exact
    # JAX clip/min tie semantics, tiny IR); the window-sum transposes are
    # hand-chained as read-only correlations — the transpose of `_win3`
    # is `_win3` of the 2-padded stat cotangent, the same shifted-read op
    # class the (compiling) forward uses.
    rows, w = o_ref.shape[4], o_ref.shape[5]
    n_h, n_w = rows + 2, w + 2
    cot = cz_ref[0, 0, 0, :n_h]
    xs = p_ref[0, 0, 0].astype(jnp.float32)   # (F, C, rows+8, Wp)
    ys = t_ref[0, 0].astype(jnp.float32)      # (C, rows+8, Wp)

    # Forward window sums (batched over leading (F, C) / (C,) dims).
    s1 = _win3(xs, 0, n_h, 0, n_w) * (1.0 / 9.0)            # mu_x
    s2 = _win3(xs * xs, 0, n_h, 0, n_w) * (1.0 / 9.0)
    sxy = _win3(xs * ys[None], 0, n_h, 0, n_w) * (1.0 / 9.0)
    mu_y = _win3(ys, 0, n_h, 0, n_w) * (1.0 / 9.0)
    sig_y = _win3(ys * ys, 0, n_h, 0, n_w) * (1.0 / 9.0) - mu_y * mu_y
    xc = xs[..., 1:1 + n_h, 1:1 + n_w]
    yc = ys[:, 1:1 + n_h, 1:1 + n_w]
    f = xs.shape[0]
    c = xs.shape[1]

    def pointwise(s1, s2, sxy, xc):
        best = None
        for fi in range(f):
            acc = None
            for ci in range(c):
                mu_x = s1[fi, ci]
                sigma_x = s2[fi, ci] - mu_x * mu_x
                sigma_xy = sxy[fi, ci] - mu_x * mu_y[ci]
                num = (2 * mu_x * mu_y[ci] + _C1) * (2 * sigma_xy + _C2)
                den = (mu_x * mu_x + mu_y[ci] * mu_y[ci] + _C1) * (
                    sigma_x + sig_y[ci] + _C2)
                s = jnp.clip((1.0 - num / den) * 0.5, 0.0, 1.0)
                d = yc[ci] - xc[fi, ci]
                ch = jnp.sqrt(d * d + _EPS * _EPS)
                t = _SSIM_W * s + _L1_W * ch
                acc = t if acc is None else acc + t
            rl = acc * (1.0 / c)
            best = rl if best is None else jnp.minimum(best, rl)
        return jnp.sum(best * cot)

    ds1, ds2, dsxy, dxc = jax.grad(pointwise, argnums=(0, 1, 2, 3))(
        s1, s2, sxy, xc)

    def corr(d):
        # Transpose of `_win3(., 0, n_h, 0, n_w)`: pixel (i, j) receives
        # the window cotangents of stats (i-2..i, j-2..j) — a 3x3 window
        # SUM over the 2-padded cotangent. Reads only.
        dp = jnp.pad(d, ((0, 0), (0, 0), (2, 2), (2, 2)))
        return _win3(dp, 0, n_h + 2, 0, n_w + 2)

    xs_pix = xs[..., :n_h + 2, :n_w + 2]
    ys_pix = ys[None][..., :n_h + 2, :n_w + 2]
    g = (corr(ds1) + corr(ds2) * (2.0 * xs_pix)
         + corr(dsxy) * ys_pix) * (1.0 / 9.0)
    g = g + jnp.pad(dxc, ((0, 0), (0, 0), (1, 1), (1, 1)))
    # Interior image rows of this block live at padded-local [2, rows+2);
    # same for cols. (Halo-row gradients are partial here and owned by the
    # neighboring blocks / the ring fixups.)
    o_ref[0, 0] = g[:, :, 2:rows + 2, 2:w + 2]


# --------------------------------------------------------------------------
# XLA-side wrapper: padding, ring fixups, fold-back.


def _pad_rz(x):
    """reflect(1) + zero(1) pad of the last two axes -> (+4, +4)."""
    h_ax, w_ax = x.ndim - 2, x.ndim - 1
    x = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, 2, axis=h_ax), x,
         jax.lax.slice_in_dim(x, x.shape[h_ax] - 2, x.shape[h_ax] - 1,
                              axis=h_ax)], axis=h_ax)
    x = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, 2, axis=w_ax), x,
         jax.lax.slice_in_dim(x, x.shape[w_ax] - 2, x.shape[w_ax] - 1,
                              axis=w_ax)], axis=w_ax)
    pads = [(0, 0)] * x.ndim
    pads[h_ax] = pads[w_ax] = (1, 1)
    return jnp.pad(x, pads)


def _fold_w(v):
    """Fold a padded-W line (cols [1, w+3) of the pad frame, length w+2)
    back onto image cols: col1 -> img 1, col w+2 -> img w-2."""
    w = v.shape[-1] - 2
    out = v[..., 1:w + 1]
    out = out.at[..., 1].add(v[..., 0])
    out = out.at[..., w - 2].add(v[..., w + 1])
    return out


def _strip_grad(fn, strip):
    """grad of a scalar strip closure, batched over leading (S, B) axes."""
    g = jax.grad(lambda st: jnp.sum(jax.vmap(jax.vmap(fn))(st)))(strip)
    return g


def _ring_fixups(preds_p, targ_p, cot):
    """Gradients of the four reflect-ring lines, as (index_fn, value)
    updates on the (S, B, F, C, H, W) image-gradient tensor.

    preds_p (S, B, F, C, Hp, Wp), targ_p (B, C, Hp, Wp), cot (S, B, H, W).
    """
    s, b, f, c, hp, wp = preds_p.shape
    h, w = hp - 4, wp - 4
    tp = jnp.broadcast_to(targ_p[None], (s,) + targ_p.shape)
    updates = []

    def closure(pr_lo_h, pr_n_h, pr_lo_w, pr_n_w, st_lo_h, st_n_h,
                st_lo_w, st_n_w, cot_slice):
        """Scalar loss restricted to one stats line; differentiating it
        w.r.t. the pred strip yields the ring gradients."""

        def fn(args):
            pstrip, tstrip, ct = args
            rl = _min_rl(pstrip, tstrip, st_lo_h, st_n_h, st_lo_w, st_n_w)
            return jnp.sum(rl * ct)

        return fn

    # Top ring: padded row 1 <- stat row 0 (strip rows 1..3 of the pad).
    pst = preds_p[:, :, :, :, 1:4, :]
    tst = tp[:, :, :, 1:4, :]
    ct = cot[:, :, 0, :]
    fn = closure(0, 3, 0, wp, 0, 1, 1, w, None)
    g = _strip_grad(lambda a: fn(a), (pst, tst, ct))[0]
    updates.append(("row", 1, _fold_w(g[:, :, :, :, 0, 1:w + 3])))

    # Bottom ring: padded row h+2 <- stat row h-1 (strip rows h..h+3).
    psb = preds_p[:, :, :, :, h:h + 3, :]
    tsb = tp[:, :, :, h:h + 3, :]
    cb = cot[:, :, h - 1, :]
    g = _strip_grad(lambda a: fn((a[0], a[1], a[2])), (psb, tsb, cb))[0]
    updates.append(("row", h - 2, _fold_w(g[:, :, :, :, 2, 1:w + 3])))

    # Left ring: padded col 1 <- stat col 0 (strip cols 1..4).
    psl = preds_p[:, :, :, :, :, 1:4]
    tsl = tp[:, :, :, :, 1:4]
    cl = cot[:, :, :, 0]

    def fn_l(args):
        pstrip, tstrip, ct = args
        rl = _min_rl(pstrip, tstrip, 1, h, 0, 1)
        return jnp.sum(rl[:, 0] * ct)

    g = _strip_grad(fn_l, (psl, tsl, cl))[0]
    updates.append(("col", 1, _fold_h(g[:, :, :, :, 1:h + 3, 0])))

    # Right ring: padded col w+2 <- stat col w-1 (strip cols w..w+3).
    psr = preds_p[:, :, :, :, :, w:w + 3]
    tsr = tp[:, :, :, :, w:w + 3]
    cr = cot[:, :, :, w - 1]

    def fn_r(args):
        pstrip, tstrip, ct = args
        rl = _min_rl(pstrip, tstrip, 1, h, 0, 1)
        return jnp.sum(rl[:, 0] * ct)

    g = _strip_grad(fn_r, (psr, tsr, cr))[0]
    updates.append(("col", w - 2, _fold_h(g[:, :, :, :, 1:h + 3, 2])))

    # Corner stats are in BOTH a row strip and a col strip — subtract the
    # four double-counted single-stat patches once.
    for (si, sj, pi, pj) in ((0, 0, 1, 1), (0, w - 1, 1, w - 2),
                             (h - 1, 0, h - 2, 1), (h - 1, w - 1, h - 2, w - 2)):
        pp = preds_p[:, :, :, :, si + 1:si + 4, sj + 1:sj + 4]
        tt = tp[:, :, :, si + 1:si + 4, sj + 1:sj + 4]
        cc = cot[:, :, si, sj]

        def fn_c(args):
            pstrip, tstrip, ct = args
            rl = _min_rl(pstrip, tstrip, 0, 1, 0, 1)
            return rl[0, 0] * ct

        g = _strip_grad(fn_c, (pp, tt, cc))[0]
        # The padded corner position inside the 3x3 patch: padded coords
        # (si+1..si+3, sj+1..sj+3); the ring corner is the one at padded
        # (1 or h+2, 1 or w+2) = patch-local (0 if si==0 else 2, ...).
        li = 0 if si == 0 else 2
        lj = 0 if sj == 0 else 2
        updates.append(("pt", (pi, pj), -g[:, :, :, :, li, lj]))
    return updates


def _fold_h(v):
    """Row analog of `_fold_w` (padded rows [1, h+3) -> image rows)."""
    h = v.shape[-1] - 2
    out = v[..., 1:h + 1]
    out = out.at[..., 1].add(v[..., 0])
    out = out.at[..., h - 2].add(v[..., h + 1])
    return out


# --------------------------------------------------------------------------
# Public entry.


def _sb_partitioned(impl, rule, arg_leads):
    """Wrap an (S, B)-pointwise computation in a custom_partitioning rule
    (Shardy einsum-style `sharding_rule`): s/b dims may shard; every other
    factor is forced replicated, and `impl` runs on the local shards.

    `arg_leads[i]` names arg i's leading dims — "sb" for (S, B, ...) or
    "b" for (B, ...) — matching `rule` (rank alone can't distinguish the
    4-D targ from the 4-D cotangent).
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def part(mesh, arg_infos, result_infos):
        # Shard s/b exactly as the first operand's dims 0/1 arrive; all
        # other dims replicated (collectives inserted by the partitioner
        # if an operand disagrees).
        spec = getattr(arg_infos[0].sharding, "spec", None) or P()
        s_ax = spec[0] if len(spec) > 0 else None
        b_ax = spec[1] if len(spec) > 1 else None

        def arg_sh(info, lead):
            nd = len(info.shape)
            head = [s_ax, b_ax] if lead == "sb" else [b_ax]
            return NamedSharding(mesh, P(*(head + [None] * (nd - len(head)))))

        arg_shardings = tuple(
            arg_sh(i, l) for i, l in zip(arg_infos, arg_leads))
        nd_out = len(result_infos.shape)
        out_sharding = NamedSharding(
            mesh, P(*([s_ax, b_ax] + [None] * (nd_out - 2))))
        return mesh, impl, out_sharding, arg_shardings

    f = custom_partitioning(impl)
    f.def_partition(partition=part, sharding_rule=rule)
    return f


@functools.lru_cache(maxsize=None)
def _fwd_cp(block_rows):
    return _sb_partitioned(
        lambda preds, targ: _fwd(preds, targ, block_rows),
        "s b f c h w, b c h w -> s b h w", ("sb", "b"))


@functools.lru_cache(maxsize=None)
def _bwd_cp(block_rows):
    return _sb_partitioned(
        lambda preds, targ, cot: _bwd_core(preds, targ, cot, block_rows),
        "s b f c h w, b c h w, s b h w -> s b f c h w", ("sb", "b", "sb"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def reproj_min_pallas(preds, targ, block_rows=64):
    """Fused `min_f(0.85*SSIM + 0.15*charb)` per (scale, batch, pixel).

    Args:
      preds: (S, B, F, C, H, W) channel-planar warped predictions.
      targ:  (B, C, H, W) target frame.
    Returns:
      (S, B, H, W) fp32 — min over frames of the reprojection loss, with
      the reference's reflect-padded 3x3 SSIM windows.
    """
    return _fwd_cp(block_rows)(preds, targ)


def _block_rows_for(h, block_rows):
    rows = min(block_rows, h)
    while h % rows:
        rows //= 2
    rows = max(rows, 1)
    if not _interpret() and rows < h:
        # TPU blocks carry a (rows+8)-row halo and the sublane block dim
        # must be 8-divisible — keep rows a multiple of 8 (or whole-h).
        while rows > 1 and (rows % 8 or h % rows):
            rows //= 2
        if rows % 8:
            rows = h
    return rows


def _halo_pad(x, extra):
    """`extra` dead zero rows at the bottom of the padded row axis, so
    each grid block can read a fixed 8-divisible row extent."""
    pads = [(0, 0)] * x.ndim
    pads[x.ndim - 2] = (0, extra)
    return jnp.pad(x, pads)


def _row_strips(x, rows, nb, strip_axis):
    """(…, H', W') -> (…, nb, rows+8, W') disjoint halo'd row strips.

    Strip i carries padded rows [i*rows, i*rows + rows + 8) — each grid
    block then reads its OWN strip through a plain BlockSpec. The halo is
    materialized HERE (one fused XLA copy, ~1.13x the input bytes at the
    flagship's rows=64) because expressing it as overlapping `pl.Element`
    blocks crashes the Mosaic compiler (`tpu_compile_helper` exit 1, no
    diagnostic) whenever the grid has >1 row block: every multi-block
    shape failed, every single-block shape compiled (round-4 repro).
    """
    h_ax = x.ndim - 2
    return jnp.stack(
        [jax.lax.slice_in_dim(x, i * rows, i * rows + rows + 8, axis=h_ax)
         for i in range(nb)], axis=strip_axis)


def _fwd(preds, targ, block_rows):
    s, b, f, c, h, w = preds.shape
    rows = _block_rows_for(h, block_rows)
    nb = h // rows
    pp = _row_strips(_halo_pad(_pad_rz(preds), 4), rows, nb, 2)
    tp_ = _row_strips(_halo_pad(_pad_rz(targ), 4), rows, nb, 1)
    wp = w + 4
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(s, b, nb),
        in_specs=[
            # pp (S, B, nb, F, C, rows+8, Wp): one strip per block.
            pl.BlockSpec((1, 1, 1, f, c, rows + 8, wp),
                         lambda si, bi, ri: (si, bi, ri, 0, 0, 0, 0)),
            # tp (B, nb, C, rows+8, Wp).
            pl.BlockSpec((1, 1, c, rows + 8, wp),
                         lambda si, bi, ri: (bi, ri, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, rows, w),
                               lambda si, bi, ri: (si, bi, ri, 0)),
        out_shape=jax.ShapeDtypeStruct((s, b, h, w), jnp.float32),
        interpret=_interpret(),
    )(pp, tp_)
    return out


def _bwd_core(preds, targ, cot, block_rows):
    """Interior pred gradients + ring fixups -> (S, B, F, C, H, W) fp32.

    Shard-local under the custom_partitioning wrapper: every term
    (kernel blocks AND the ring strip closures) depends only on this
    shard's (S, B) slice."""
    s, b, f, c, h, w = preds.shape
    # Smaller backward blocks: the grad-of-closure kernel holds the
    # block's forward residuals in VMEM (~16 MB/core on v5e).
    rows = _block_rows_for(h, min(block_rows, 16))
    nb = h // rows
    pp0 = _pad_rz(preds)                  # rows axis: h+4 (ring fixups)
    tp0 = _pad_rz(targ)
    # Disjoint halo'd strips (see _row_strips: overlapping Element blocks
    # crash Mosaic).
    pp = _row_strips(_halo_pad(pp0, 4), rows, nb, 2)
    tp_ = _row_strips(_halo_pad(tp0, 4), rows, nb, 1)
    wp = w + 4
    cot = cot.astype(jnp.float32)
    # Zero-embedded cotangent with a 1-stat halo ring (+6 dead pad rows so
    # cz strips carry a fixed rows+8 extent).
    cz = jnp.zeros((s, b, h + 8, w + 2), jnp.float32)
    cz = cz.at[:, :, 1:h + 1, 1:-1].set(cot)
    cz = _row_strips(cz, rows, nb, 2)     # (S, B, nb, rows+8, W+2)
    dint = pl.pallas_call(
        _bwd_kernel,
        grid=(s, b, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 1, f, c, rows + 8, wp),
                         lambda si, bi, ri: (si, bi, ri, 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, c, rows + 8, wp),
                         lambda si, bi, ri: (bi, ri, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, rows + 8, w + 2),
                         lambda si, bi, ri: (si, bi, ri, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, f, c, rows, w),
                               lambda si, bi, ri: (si, bi, 0, 0, ri, 0)),
        out_shape=jax.ShapeDtypeStruct((s, b, f, c, h, w), jnp.float32),
        interpret=_interpret(),
    )(pp, tp_, cz)
    for kind, where, val in _ring_fixups(pp0, tp0, cot):
        if kind == "row":
            dint = dint.at[:, :, :, :, where, :].add(val)
        elif kind == "col":
            dint = dint.at[:, :, :, :, :, where].add(val)
        else:
            i, j = where
            dint = dint.at[:, :, :, :, i, j].add(val)
    return dint


def _vjp_fwd(preds, targ, block_rows):
    return _fwd_cp(block_rows)(preds, targ), (preds, targ)


def _vjp_bwd(block_rows, res, cot):
    preds, targ = res
    dint = _bwd_cp(block_rows)(preds, targ, cot)
    # Target is input data in every call site — no cotangent needed.
    return dint.astype(preds.dtype), jnp.zeros_like(targ)


reproj_min_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def reproj_min_reference(preds, targ):
    """Pure-XLA reference of the same contract (parity tests): the
    existing `ops.photometric.reprojection_loss` chain + frame-min."""
    from ..photometric import reprojection_loss

    s, b, f, c, h, w = preds.shape
    x = jnp.transpose(preds, (0, 2, 1, 4, 5, 3))  # (S, F, B, H, W, C)
    t = jnp.transpose(targ, (0, 2, 3, 1))  # (B, H, W, C)
    rl = reprojection_loss(x.reshape(s * f, b, h, w, c),
                           t)[..., 0].astype(jnp.float32)
    return rl.reshape(s, f, b, h, w).min(axis=1)
