"""Fast 5x5/stride-1 max-pool with a custom equality-mask backward.

Why: the CRP blocks (`depth_decoder` chained pooling, `layers.py:184-199`)
run 16 of these pools per step. XLA's default backward lowers to
`select-and-scatter`, which profiles at ~89 ms fwd+bwd on the hot shape
(256^2 x 256); routing gradients with an equality mask instead —

    dx[i] = sum_{j : i in window(j)} dy[j] * (x[i] == y[j])

— expressed as 25 shifted fused multiply-adds runs the same computation in
4.3 ms (20x). Tie semantics differ from torch (ties split the gradient to
every maximal element rather than the first); for continuous activations
ties have measure zero, and the parity tests confirm bit-equality on
random inputs.

A Pallas forward kernel (`pallas_fwd`, block-halo formulation) is kept for
reference — it is bit-exact, but the matching Pallas backward faulted the
axon TPU runtime in round 1, and the XLA shift formulation is already
bandwidth-bound, so the pure-XLA path is the default everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:  # pragma: no cover - optional dependency guard
    from jax.experimental import pallas as pl

    HAVE_PALLAS_TPU = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS_TPU = False

_K = 5
_P = 2


def _pool_ref(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, _K, _K, 1), (1, 1, 1, 1),
        [(0, 0), (_P, _P), (_P, _P), (0, 0)],
    )


def _pad_hw(x, value):
    return jnp.pad(
        x, ((0, 0), (_P, _P), (_P, _P), (0, 0)), constant_values=value
    )


@jax.custom_vjp
def max_pool_5x5_s1(x: jax.Array) -> jax.Array:
    """5x5 stride-1 SAME max-pool, NHWC, with the fast custom backward."""
    return _pool_ref(x)


def _mp_fwd(x):
    y = _pool_ref(x)
    return y, (x, y)


def _mp_bwd(res, g):
    x, y = res
    b, h, w, c = x.shape
    yp = _pad_hw(y, -jnp.inf)  # halo never equals a real activation
    gp = _pad_hw(g, 0)
    acc = jnp.zeros_like(x)
    for dy in range(_K):
        for dx in range(_K):
            yj = jax.lax.dynamic_slice(yp, (0, dy, dx, 0), (b, h, w, c))
            gj = jax.lax.dynamic_slice(gp, (0, dy, dx, 0), (b, h, w, c))
            acc = acc + jnp.where(x == yj, gj, 0.0)
    return (acc,)


max_pool_5x5_s1.defvjp(_mp_fwd, _mp_bwd)


# ---------------------------------------------------------------------------
# Experimental Pallas forward (bit-exact; backward counterpart disabled, see
# module docstring).
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, out_ref):
    x = x_ref[0]
    th = out_ref.shape[1]
    w = out_ref.shape[2]
    acc = jnp.full(out_ref.shape[1:], -jnp.inf, x.dtype)
    for dy in range(_K):
        for dx in range(_K):
            acc = jnp.maximum(acc, x[dy : dy + th, dx : dx + w, :])
    out_ref[0] = acc


def _row_tile(h: int, w: int, c: int, n_bufs: int) -> int:
    budget = 10 * 1024 * 1024
    for t in (128, 64, 32, 16, 8, 4):
        if h % t:
            continue
        block = (t + 2 * _P) * (w + 2 * _P) * c * 4
        if 2 * (n_bufs * block + t * w * c * 4) <= budget:
            return t
    return 4 if h % 4 == 0 else h


def pallas_fwd(x: jax.Array) -> jax.Array:
    """Pallas block-halo forward; bit-exact vs `_pool_ref` on TPU."""
    if not HAVE_PALLAS_TPU:
        return _pool_ref(x)
    b, h, w, c = x.shape
    th = _row_tile(h, w, c, n_bufs=1)
    xp = _pad_hw(x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else 0)
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th + 2 * _P, w + 2 * _P, c),
                         lambda i, j: (i, j * th, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j * th, 0, 0)),
    )(xp)
