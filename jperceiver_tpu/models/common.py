"""Shared conv blocks for the decoder heads."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


from ..ops.padding import reflect_pad  # noqa: F401 (re-export, legacy path)


class ConvReflect3x3(nn.Module):
    """ReflectionPad(1) + 3x3 VALID conv — the reference's `Conv3x3`

    (`layers.py:156-167`), used across depth/layout decoders and CCT.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), padding="VALID",
                       dtype=self.dtype, name="conv")(reflect_pad(x))


class Conv1x1(nn.Module):
    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                       dtype=self.dtype, name="conv")(x)


class CRPBlock(nn.Module):
    """Chained residual pooling (`layers.py:184-199`): n stages of

    maxpool(5x5, s1) -> 1x1 conv, summed into the trunk.
    """

    features: int
    n_stages: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas.maxpool import max_pool_5x5_s1

        top = x
        for i in range(self.n_stages):
            # Custom-bwd pool: XLA's select-and-scatter backward is ~20x
            # slower on TPU (see ops/pallas/maxpool.py).
            top = max_pool_5x5_s1(top)
            top = nn.Conv(self.features, (1, 1), use_bias=False,
                          dtype=self.dtype, name=f"pointwise{i + 1}")(top)
            x = top + x
        return x
