"""Pallas 3x3/stride-1 SAME conv for shallow-channel layers.

Why: XLA's conv lowering on this platform collapses on small channel
counts — a 64ch 3x3 at 512² measures 3.9 ms (5 TFLOP/s) while the same
FLOPs as a matmul run at ~100 TFLOP/s (`benchmarks/convbench2.py`). The
ResNet stems and layer1/2 blocks of all three trunks live in exactly that
regime. This kernel rebuilds the conv as im2col-in-VMEM + one MXU dot per
row-tile, which is bandwidth- and MXU-friendly at any channel width.

Backward strategy (the axon runtime faulted on bespoke Pallas backward
kernels in round 1): dL/dx is ITSELF a 3x3 conv — with spatially flipped,
transposed weights — so it reuses this same forward kernel; dL/dW is a
9-tap shifted contraction done in plain XLA (matmul-shaped, already fast).

Numerics: taps and weights feed the MXU in their input dtype with float32
accumulation — the same contract as `lax.conv` with
preferred_element_type=float32.
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


def _ref_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _fwd_kernel(x_ref, w_ref, out_ref):
    """x_ref: (1, TH+2, W+2, C) halo tile; w_ref: (9C, O); out: (1, TH, W, O).

    Nine shifted (TH*W, C) x (C, O) MXU dots accumulated in fp32 — avoids
    the big im2col concat, which Mosaic handles poorly on the lane axis.
    """
    x = x_ref[0]
    th, wd, o = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    c = x.shape[-1]
    acc = jnp.zeros((th * wd, o), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = x[dy : dy + th, dx : dx + wd, :].reshape(th * wd, c)
            k = (dy * 3 + dx) * c
            acc += jnp.dot(tap, w_ref[k : k + c, :],
                           preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(th, wd, o).astype(out_ref.dtype)


def _row_tile(h: int, w: int, c: int, o: int, itemsize: int) -> int:
    budget = 9 * 1024 * 1024  # leave headroom under the ~16 MB VMEM
    for t in (64, 32, 16, 8, 4, 2, 1):
        if h % t:
            continue
        tile_in = (t + 2) * (w + 2) * c * itemsize
        cols = t * w * 9 * c * itemsize
        tile_out = t * w * o * 4
        if 2 * tile_in + cols + tile_out <= budget:
            return t
    return 1


@functools.partial(jax.jit, static_argnames=())
def _pallas_conv3x3_raw(x: jax.Array, w: jax.Array) -> jax.Array:
    b, h, wd, c = x.shape
    o = w.shape[-1]
    th = _row_tile(h, wd, c, o, x.dtype.itemsize)
    n = h // th
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # Overlapping halo tiles materialized in XLA (Pallas block offsets are
    # in block units, so halos cannot overlap through BlockSpecs alone):
    # (B, n, TH+2, W+2, C) — ~(2/TH) duplication.
    starts = [t * th for t in range(n)]
    xt = jnp.stack([xp[:, s0 : s0 + th + 2] for s0 in starts], axis=1)
    xt = xt.reshape(b * n, th + 2, wd + 2, c)
    w2 = w.reshape(9 * c, o)
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((b * n, th, wd, o), x.dtype),
        grid=(b * n,),
        in_specs=[
            pl.BlockSpec((1, th + 2, wd + 2, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9 * c, o), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wd, o), lambda i: (i, 0, 0, 0)),
    )(xt, w2)
    return out.reshape(b, h, wd, o)


def _wgrad(x: jax.Array, g: jax.Array) -> jax.Array:
    """dL/dW for 3x3 SAME conv: 9 shifted (C, N)x(N, O) contractions (XLA)."""
    b, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy : dy + h, dx : dx + wd, :].reshape(-1, c)
            taps.append(
                jnp.dot(xs.T, g.reshape(-1, g.shape[-1]),
                        preferred_element_type=jnp.float32)
            )
    return jnp.stack(taps, 0).reshape(3, 3, c, g.shape[-1])


@jax.custom_vjp
def pallas_conv3x3(x: jax.Array, w: jax.Array) -> jax.Array:
    """3x3 stride-1 SAME NHWC conv; falls back to lax.conv off-TPU."""
    return _pallas_conv3x3_raw(x, w)


def _fwd(x, w):
    return _pallas_conv3x3_raw(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # dgrad: conv of g with flipped/transposed weights — reuse the kernel.
    w_flip = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _pallas_conv3x3_raw(g.astype(x.dtype), w_flip.astype(x.dtype))
    dw = _wgrad(x, g).astype(w.dtype)
    return dx, dw


pallas_conv3x3.defvjp(_fwd, _bwd)


def conv3x3_auto(x: jax.Array, w: jax.Array, use_pallas: bool = True) -> jax.Array:
    """Pallas path when available/applicable, else the XLA conv."""
    if (
        use_pallas
        and HAVE_PALLAS_TPU
        and jax.devices()[0].platform != "cpu"
        and x.shape[-1] * 9 * x.dtype.itemsize * x.shape[2] < 4 * 1024 * 1024
    ):
        return pallas_conv3x3(x, w)
    return _ref_conv(x, w)
