"""Pallas 3x3/stride-1 conv for shallow-channel layers.

Why: XLA's conv lowering on this platform collapses on small channel
counts — a 64ch 3x3 at 512² measures 3.9 ms (5 TFLOP/s) while the same
FLOPs as a matmul run at ~100 TFLOP/s (`benchmarks/convbench2.py`). The
ResNet stems and layer1/2 blocks of all three trunks live in exactly that
regime. This kernel rebuilds the conv as nine shifted MXU dots per
row-tile (tap slices straight out of VMEM — no im2col materialization),
which is bandwidth- and MXU-friendly at any channel width.

Variants:
  * `pallas_conv3x3(x, w, b)`        — SAME zero padding (ResNet blocks).
  * `pallas_conv3x3_valid(xp, w, b)` — VALID on a pre-padded (H+2, W+2)
    input: composes with `reflect_pad` for the decoders' reflect conv;
    autodiff of the pad wrapper folds border gradients back correctly.

Backward strategy (the axon runtime faulted on bespoke Pallas backward
kernels in round 1): dL/dx is ITSELF a 3x3 conv — with spatially flipped,
transposed weights and padding (2 - pad_fwd) — so it reuses this same
forward kernel; dL/dW is a 9-tap shifted contraction done in plain XLA
(matmul-shaped, already fast); dL/db is a plain reduction.

Numerics: taps and weights feed the MXU in their input dtype with float32
accumulation — the same contract as `lax.conv` with
preferred_element_type=float32. Bias is added to the fp32 accumulator.

On CPU (tests) the pallas_call runs in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pragma: no cover - optional dependency guard
    from jax.experimental import pallas as pl

    HAVE_PALLAS_TPU = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS_TPU = False


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _ref_conv(x: jax.Array, w: jax.Array, pad: int) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _fwd_kernel(x_ref, w_ref, b_ref, out_ref):
    """x_ref: (1, TH+2, W+2, C) halo tile; w_ref: (9C, O); b_ref: (1, O);
    out: (1, TH, W, O).

    Nine shifted (TH*W, C) x (C, O) MXU dots accumulated in fp32 — avoids
    the big im2col concat, which Mosaic handles poorly on the lane axis.
    """
    x = x_ref[0]
    th, wd, o = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    c = x.shape[-1]
    acc = jnp.broadcast_to(b_ref[0].astype(jnp.float32), (th * wd, o))
    for dy in range(3):
        for dx in range(3):
            tap = x[dy : dy + th, dx : dx + wd, :].reshape(th * wd, c)
            k = (dy * 3 + dx) * c
            acc = acc + jnp.dot(tap, w_ref[k : k + c, :],
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(th, wd, o).astype(out_ref.dtype)


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _row_tile(h: int, w: int, c: int, o: int, itemsize: int) -> int:
    """Largest row tile whose VMEM footprint fits, in HARDWARE-PADDED sizes:
    Mosaic tiles the last dim to 128 lanes and the second-to-last to 8 (fp32)
    / 16 (bf16) sublanes, so a C=16 buffer occupies 128 lanes regardless
    (ignoring this OOM'd the scoped-vmem allocator at 27.7 MB on the O=2
    topview head)."""
    # Headroom under the ~16 MB/core VMEM. 12 MB (was 10) so the deep
    # 256-ch decoder sites tile at 8 rows instead of 4 — the t=4 choice
    # carries a 1.5x halo duplication in the strip materialization and
    # M=1024-row dots; the formula below already overcounts (taps and
    # output double-counted against their actual buffer reuse).
    budget = 12 * 1024 * 1024
    sub = 8 if itemsize == 4 else 16
    c_eff = _pad_to(c, 128)
    o_eff = _pad_to(o, 128)
    for t in (64, 32, 16, 8, 4, 2, 1):
        if h % t:
            continue
        tile_in = 2 * _pad_to(t + 2, sub) * (w + 2) * c_eff * itemsize
        acc = _pad_to(t * w, sub) * o_eff * 4  # fp32 accumulator
        taps = 2 * _pad_to(t * w, sub) * c_eff * itemsize
        tile_out = 2 * _pad_to(t * w, sub) * o_eff * itemsize
        if tile_in + acc + taps + tile_out <= budget:
            return t
    return 1


@functools.partial(jax.jit, static_argnames=("pad",))
def _pallas_conv3x3_raw(x: jax.Array, w: jax.Array, b: jax.Array,
                        pad: int = 1) -> jax.Array:
    """3x3 stride-1 conv with `pad` zero-padding (pad=1 SAME, 0 VALID on a
    pre-padded input, 2 full — the dgrad of VALID)."""
    bsz, h, wd, c = x.shape
    o = w.shape[-1]
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    ho, wo = h + 2 * pad - 2, wd + 2 * pad - 2
    th = _row_tile(ho, wo, c, o, x.dtype.itemsize)
    n = ho // th
    # Overlapping halo tiles materialized in XLA (Pallas block offsets are
    # in block units, so halos cannot overlap through BlockSpecs alone):
    # (B, n, TH+2, Wo+2, C) — ~(2/TH) duplication.
    xt = jnp.stack([x[:, t * th : t * th + th + 2] for t in range(n)], axis=1)
    xt = xt.reshape(bsz * n, th + 2, wo + 2, c)
    w2 = w.reshape(9 * c, o)
    b2 = b.reshape(1, o)
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((bsz * n, th, wo, o), x.dtype),
        grid=(bsz * n,),
        in_specs=[
            pl.BlockSpec((1, th + 2, wo + 2, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9 * c, o), lambda i: (0, 0)),
            pl.BlockSpec((1, o), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wo, o), lambda i: (i, 0, 0, 0)),
        interpret=_interpret(),
    )(xt, w2, b2)
    return out.reshape(bsz, ho, wo, o)


_WGRAD_PALLAS: bool = True  # strip-accumulating Pallas wgrad (round 5)


def _wgrad_kernel(x_ref, g_ref, out_ref):
    """One halo'd x strip + matching g strip -> += nine (C, O) tap dots.

    out (9C, O) fp32 maps to the SAME block on every grid step, so the
    accumulator stays VMEM-resident across the sequential grid and x/g
    stream through once — vs the XLA 9-tap form whose every tap re-reads
    the full activation tensor from HBM (~4x bandwidth-bound at the
    decoder's (65536, 256, 256) sites; DESIGN.md round-5 MXU table).
    Contractions use dot_general on the M dim directly — no transposed
    operand materialization (explicit transposes are the op class that
    crashed Mosaic in the reproj backward).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[0]
    g = g_ref[0]
    th, wd, o = g.shape
    c = x.shape[-1]
    gf = g.reshape(th * wd, o)
    for dy in range(3):
        for dx in range(3):
            tap = x[dy : dy + th, dx : dx + wd, :].reshape(th * wd, c)
            k = (dy * 3 + dx) * c
            out_ref[k : k + c, :] += jax.lax.dot_general(
                tap, gf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _wgrad_pallas(x: jax.Array, g: jax.Array, pad: int) -> jax.Array:
    """dL/dW via the strip-accumulating kernel; falls back to `_wgrad`
    when the row tiling degenerates (tiny spatial extents)."""
    bsz, h, wd, c = x.shape
    ho, wo = g.shape[1], g.shape[2]
    o = g.shape[-1]
    th = _row_tile(ho, wo, c, o, x.dtype.itemsize)
    if th < 4:
        return _wgrad(x, g, pad)
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    n = ho // th
    xt = jnp.stack([x[:, t * th : t * th + th + 2] for t in range(n)], axis=1)
    xt = xt.reshape(bsz * n, th + 2, x.shape[2], c)
    gt = g.reshape(bsz, n, th, wo, o).reshape(bsz * n, th, wo, o)
    out = pl.pallas_call(
        _wgrad_kernel,
        out_shape=jax.ShapeDtypeStruct((9 * c, o), jnp.float32),
        grid=(bsz * n,),
        in_specs=[
            pl.BlockSpec((1, th + 2, x.shape[2], c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, th, wo, o), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((9 * c, o), lambda i: (0, 0)),
        interpret=_interpret(),
    )(xt, gt)
    return out.reshape(3, 3, c, o)


def _wgrad(x: jax.Array, g: jax.Array, pad: int) -> jax.Array:
    """dL/dW: 9 shifted (C, N)x(N, O) contractions (XLA, matmul-shaped)."""
    bsz, h, wd, c = x.shape
    ho, wo = g.shape[1], g.shape[2]
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    taps = []
    gf = g.reshape(-1, g.shape[-1])
    for dy in range(3):
        for dx in range(3):
            xs = x[:, dy : dy + ho, dx : dx + wo, :].reshape(-1, c)
            taps.append(
                jnp.dot(xs.T, gf, preferred_element_type=jnp.float32)
            )
    return jnp.stack(taps, 0).reshape(3, 3, c, g.shape[-1])


def _flip_t(w: jax.Array) -> jax.Array:
    return jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)


def _make(pad_fwd: int):
    """custom_vjp conv with static forward padding (1=SAME, 0=VALID)."""

    @jax.custom_vjp
    def conv(x, w, b):
        return _pallas_conv3x3_raw(x, w, b, pad=pad_fwd)

    def fwd(x, w, b):
        return conv(x, w, b), (x, w)

    def bwd(res, g):
        x, w = res
        zero = jnp.zeros((w.shape[2],), x.dtype)
        # dgrad: conv of g with flipped/transposed weights at pad 2-pad_fwd
        # (SAME stays SAME; VALID's dgrad is the full conv) — reuse kernel.
        dx = _pallas_conv3x3_raw(
            g.astype(x.dtype), _flip_t(w).astype(x.dtype), zero,
            pad=2 - pad_fwd)
        wg = _wgrad_pallas if _WGRAD_PALLAS else _wgrad
        dw = wg(x, g, pad_fwd).astype(w.dtype)
        db = jnp.sum(g, axis=(0, 1, 2)).astype(w.dtype)
        return dx, dw, db

    conv.defvjp(fwd, bwd)
    return conv


# SAME zero padding: drop-in for lax.conv(..., "SAME") (ResNet 3x3s).
pallas_conv3x3 = _make(1)
# VALID on an already (H+2, W+2)-padded input: compose with reflect_pad
# for the decoders' ConvReflect3x3 (autodiff of the pad handles fold-back).
pallas_conv3x3_valid = _make(0)


def use_pallas_conv(c_in: int, c_out: int, h: int, w: int) -> bool:
    """Eligibility: TPU backend + the per-op chained bench's win regime.

    MEASURED NEGATIVE on the whole step (round 3) — the flag stays off
    by default. Per-op chained benches (`benchmarks/convbench3.py`)
    suggested a win for shallow channels at large spatial dims (64-128
    ch: 1.05-1.27x) with losses at 256 ch (0.74-0.93x, XLA's own
    lowering is already matmul-class there) and <=32 ch (3/4 of the
    padded 128-lane MXU operand wasted either way). But the decisive
    whole-step flagship bench LOST in both configurations:
    all sites 7.35 f/s, this restricted gate 6.84 f/s, vs 8.24 f/s for
    XLA's lowering (bench.py --pconv). In-step, XLA fuses the
    surrounding elementwise/BN/ReLU work into its conv loops; the
    custom_call is a fusion barrier that re-reads activations from HBM,
    which the standalone bench cannot see. Kept as an experimental
    knob (`cfg.use_pallas_conv`) with full fwd/bwd parity tests.
    """
    if not HAVE_PALLAS_TPU or _interpret():
        return False
    if h < 8 or w < 8 or h % 2 or w % 2:
        return False
    if not (48 <= c_in <= 128 and c_out <= 128):
        return False
    return h * w >= 16384  # >= 128^2-class spatial extent


def use_pallas_conv_deep(c_in: int, c_out: int, h: int, w: int) -> bool:
    """Eligibility for the DEEP-channel gate (round 5).

    Round 5's trace attribution (DESIGN.md, `ceiling.json::dots_top_shapes`)
    showed two thirds of the step's dot FLOPs are K=256/N=256 nine-dot tap
    contractions (the depth decoder's bottleneck-256 iconv/merge sites at
    256^2/128^2/64^2 and the trunk layer2/3 blocks) running ~2x below the
    MXU roofline — bandwidth-bound on re-reading the shifted activation
    views per tap, NOT shape-limited. This kernel reads each activation
    strip once and issues the nine dots from VMEM, which is exactly the
    remedy; the shallow-channel gate above targeted a different regime
    (where XLA's own conv lowering was the competitor) and lost to fusion
    effects — here the competitor is the nine-dot XLA form whose operand
    movement is the measured cost.
    """
    if not HAVE_PALLAS_TPU or _interpret():
        return False
    if h < 8 or w < 8:
        return False
    return c_in >= 128 and c_out >= 128 and h * w >= 4096


def conv3x3_auto(x: jax.Array, w: jax.Array, use_pallas: bool = True) -> jax.Array:
    """Pallas path when available/applicable, else the XLA conv."""
    if use_pallas and use_pallas_conv(
            x.shape[-1], w.shape[-1], x.shape[1], x.shape[2]):
        return pallas_conv3x3(x, w, jnp.zeros((w.shape[-1],), x.dtype))
    return _ref_conv(x, w, 1)
