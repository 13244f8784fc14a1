"""3x3 conv lowered as nine shifted matmuls — at the XLA level.

Replaces `lax.conv_general_dilated` for stride-1 3x3s with

    y = sum_{dy,dx} x[:, dy:dy+H, dx:dx+W, :] @ W[dy, dx]

i.e. nine (B*H*W, C) @ (C, O) dots over statically shifted views of the
zero-padded input. Rationale (v5e, measured in `benchmarks/convbench2/3`
and the round-2 DESIGN log):

- XLA's conv lowering runs shallow/medium-channel 3x3s at 5-14 TFLOP/s
  vs ~103 TFLOP/s for plain matmuls on the same chip; the MXU sees a
  dense (C x O) contraction per tap here instead of a strided conv.
- Unlike the Pallas kernel (`ops/pallas/conv3x3.py`, a measured
  whole-step NEGATIVE), this form is pure XLA: BN/ReLU/adds still fuse
  into the matmul epilogues and the shifted slices fuse into operand
  reads — no custom_call fusion barrier, no HBM re-reads.
- The autodiff transpose is nine dense matmuls in each direction:
  wgrad becomes (C, B*H*W) @ (B*H*W, O) reduction matmuls — the op
  class XLA's conv-wgrad lowering is slowest at (the C_in=3 stem wgrad
  measured 1/128 utilization in round 2, fixed then by space-to-depth;
  this generalizes that fix to every stride-1 3x3).

Numerics: each tap's dot accumulates fp32 on the MXU and rounds to the
compute dtype; the nine-term sum is carried in fp32 and cast once. This
matches conv's internal-fp32 accumulation to ~1 bf16 ulp (parity test
`tests/test_conv9dot.py`).

The DispConv (3x3xC -> 1) and ConvReflect3x3Split decompositions in
`models/common.py` are special cases of the same idea, landed in round 2
with measured wins; this module is the general form, switchable via
`cfg.conv3x3_dots` (trace-time scope in `models/common.py::Conv3x3`).

Reference parity target: the stride-1 3x3 convs of
`mono/model/mono_baseline/resnet.py` / the decoders (`depth_decoder.py`,
`layout_model.py`) — same math, TPU-first lowering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv3x3_dots(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
                 mode: str = "same", stride: int = 1) -> jax.Array:
    """3x3 conv (stride 1 or 2) as nine shifted matmuls.

    Args:
      x: (B, H, W, C) — for mode="valid" the input is already padded by 1
         on each spatial side (the reflect-pad call sites), so the output
         is (B, H-2, W-2, O) at stride 1.
      w: (3, 3, C, O) HWIO kernel.
      b: (O,) bias or None.
      mode: "same" (zero pad 1) or "valid" (pre-padded input).
      stride: 1 or 2. At stride 2 each tap is a strided view — H-strides
        are major-dim (free) and W-strides ride the SUBLANE dim for
        deep-channel activations (C in lanes), the regime measured fine on
        v5e (lane-dim strides are the pathological case; the stride-2
        sites all have C_in >= 64 so C owns the lanes).
    """
    if mode == "same":
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    elif mode == "valid":
        xp = x
    else:
        raise ValueError(f"unsupported mode: {mode}")
    ho = (xp.shape[1] - 3) // stride + 1
    wo = (xp.shape[2] - 3) // stride + 1
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.slice(
                xp,
                (0, dy, dx, 0),
                (xp.shape[0], dy + (ho - 1) * stride + 1,
                 dx + (wo - 1) * stride + 1, xp.shape[3]),
                (1, stride, stride, 1))
            # (B,Ho,Wo,C) @ (C,O): fp32 MXU accumulation inside the dot,
            # fp32 carry across the nine taps, one cast at the end.
            t = jnp.einsum("bhwc,co->bhwo", tap, w[dy, dx]).astype(jnp.float32)
            acc = t if acc is None else acc + t
    y = acc.astype(x.dtype)
    return y + b.astype(x.dtype) if b is not None else y


def conv3x3_tapcat(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
                   mode: str = "same", stride: int = 1) -> jax.Array:
    """3x3 conv as ONE matmul over the lane-concatenated 9 taps.

    All nine shifted views are concatenated on the channel (lane) axis and
    contracted in a single (B*Ho*Wo, 9C) @ (9C, O) dot — the StemConv
    recipe (`models/resnet.py`) generalized to any 3x3. For SHALLOW inputs
    this is denser MXU work than nine K=C dots (C=16 gives K=144 vs K=16;
    a 128x128 MXU tile is K-starved below ~64), at the cost of writing the
    9-tap concat (9x the input bytes) — a good trade only when C is small,
    which is exactly the regime where the K=C dots are starved. Selection
    is by C_in threshold (`models/common.py::_dots_active`).

    Same contract as `conv3x3_dots`.
    """
    if mode == "same":
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    elif mode == "valid":
        xp = x
    else:
        raise ValueError(f"unsupported mode: {mode}")
    ho = (xp.shape[1] - 3) // stride + 1
    wo = (xp.shape[2] - 3) // stride + 1
    taps = []
    for dy in range(3):
        for dx in range(3):
            taps.append(jax.lax.slice(
                xp,
                (0, dy, dx, 0),
                (xp.shape[0], dy + (ho - 1) * stride + 1,
                 dx + (wo - 1) * stride + 1, xp.shape[3]),
                (1, stride, stride, 1)))
    t = jnp.concatenate(taps, axis=-1)  # (B,Ho,Wo,9C), lane order (dy,dx,c)
    wf = w.reshape(-1, w.shape[-1])     # (9C, O), same (dy,dx,c) order
    y = jnp.einsum("bhwk,ko->bhwo", t, wf).astype(x.dtype)
    return y + b.astype(x.dtype) if b is not None else y


# --- fused nearest-up2 + reflect-padded 3x3 conv ("fold_upconv") -------------
#
# conv3x3(reflect_pad(up2_nearest(x))) never needs the up2 tensor: output
# pixel (2i+p, 2j+q) reads up-grid rows {2i+p-1, 2i+p, 2i+p+1}, which
# collapse onto x rows {i-1, i} (phase p=0) or {i, i+1} (p=1) — taps that
# hit the same x row just sum their kernel weights. Each of the 4 output
# phases is therefore a 2x2 conv over x with pair-summed kernels, and the
# reflect ring of the up grid (up[-1] = up[1] = x[0]) is exactly EDGE
# (replicate) padding of x under the folded weights. 4 phases x 4 taps =
# 16 C-deep dots per x pixel vs 9 per up pixel: 2.25x fewer FLOPs, and
# the (2H, 2W, C) upsample materialization (134 MB bf16 at 512^2 x 256)
# disappears. Exact up to fp reassociation (weights pair-sum in fp32).
#
# Targets the depth decoder's up->iconv / up->disp-head edges
# (`depth_decoder.py:7-137` structure; reference computes the conv on the
# materialized `F.interpolate` output).

_R_PHASE = (
    ((1.0, 0.0, 0.0), (0.0, 1.0, 1.0)),  # p=0: taps (x[i-1], x[i])
    ((1.0, 1.0, 0.0), (0.0, 0.0, 1.0)),  # p=1: taps (x[i], x[i+1])
)


def _edge_pad1(x: jax.Array) -> jax.Array:
    """NHWC replicate pad by 1 (slice+concat, like ops/padding.py)."""
    x = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)
    return jnp.concatenate([x[:, :, :1], x, x[:, :, -1:]], axis=2)


def _up_pad1(x: jax.Array, pad: str) -> jax.Array:
    """The x-grid pad equivalent to `pad` on the up grid: reflect-on-up
    == EDGE on x (up[-1] = up[1] = x[0]); zero-on-up == ZERO on x."""
    if pad == "reflect":
        return _edge_pad1(x)
    if pad == "zero":
        return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    raise ValueError(f"unsupported pad: {pad}")


def _fold_kernels(w: jax.Array) -> jax.Array:
    """(3, 3, C, O) -> (2, 2, 2, 2, C, O): [p, q, r, s] phase kernels.

    K[p,q][r,s] = sum_{u,v} R[p][r,u] R[q][s,v] w[u,v]; fp32 pair-sums.
    """
    r = jnp.asarray(_R_PHASE, jnp.float32)  # (2, 2, 3)
    return jnp.einsum("pru,qsv,uvco->pqrsco", r, r, w.astype(jnp.float32))


def _interleave_phases(y, h, w):
    """y[p][q] of (B, H, W, O) -> (B, 2H, 2W, O)."""
    rows = jnp.stack([jnp.stack(y[0], axis=3), jnp.stack(y[1], axis=3)],
                     axis=2)  # (B, H, 2, W, 2, O)
    return rows.reshape(rows.shape[0], 2 * h, 2 * w, rows.shape[-1])


def upconv3x3_dots(x: jax.Array, w: jax.Array,
                   b: jax.Array | None = None,
                   pad: str = "reflect") -> jax.Array:
    """`conv3x3(pad(up2_nearest(x)), w)` without materializing the up2.

    Args:
      x: (B, H, W, C) pre-upsample activations.
      w: (3, 3, C, O) HWIO kernel (the unfolded conv's own parameters).
      b: (O,) bias or None.
      pad: the UP-grid padding being emulated — "reflect" (the decoders'
        ReflectionPad2d) or "zero" (SAME convs).
    Returns: (B, 2H, 2W, O) in x.dtype.
    """
    bsz, h, wd, c = x.shape
    kf = _fold_kernels(w)
    xp = _up_pad1(x, pad)
    y = [[None, None], [None, None]]
    for p in range(2):
        for q in range(2):
            acc = None
            for r in range(2):
                for s in range(2):
                    tap = xp[:, p + r:p + r + h, q + s:q + s + wd, :]
                    t = jnp.einsum(
                        "bhwc,co->bhwo", tap,
                        kf[p, q, r, s].astype(x.dtype)).astype(jnp.float32)
                    acc = t if acc is None else acc + t
            y[p][q] = acc.astype(x.dtype)
    out = _interleave_phases(y, h, wd)
    return out + b.astype(x.dtype) if b is not None else out


def updisp3x3(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """`DispConv(up2_nearest(x))` fused: the C_out=1 head's matmul+shift
    decomposition (`models/common.py::_DispConvInner`) with the upsample
    folded in. One dense (C, 16) matmul at x resolution (vs (C, 9) at up
    resolution = 4x the pixels), then 4 shifted adds per phase.

    Args:
      x: (B, H, W, C); w: (3, 3, C, 1); b: (1,).
    Returns: (B, 2H, 2W, 1).
    """
    bsz, h, wd, c = x.shape
    kf = _fold_kernels(w)                       # (2,2,2,2,C,1)
    wf = kf[..., 0].reshape(16, c).T            # (C, 16), (p,q,r,s)-major
    xp = _edge_pad1(x)
    z = jnp.einsum("bhwc,cd->bhwd", xp.astype(x.dtype), wf.astype(x.dtype))
    y = [[None, None], [None, None]]
    for p in range(2):
        for q in range(2):
            acc = None
            for r in range(2):
                for s in range(2):
                    d = ((p * 2 + q) * 2 + r) * 2 + s
                    t = z[:, p + r:p + r + h, q + s:q + s + wd, d]
                    acc = t if acc is None else acc + t
            y[p][q] = acc[..., None]
    return _interleave_phases(y, h, wd) + b.astype(z.dtype)
