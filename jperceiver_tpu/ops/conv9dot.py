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
