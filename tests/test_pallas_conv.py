"""Parity tests for the Pallas 3x3 conv (fwd + custom VJP) vs lax.conv.

Runs in interpret mode on CPU; the same code compiles on TPU. Covers both
padding variants (SAME; VALID-on-pre-padded for the reflect-pad decoder
convs), both dtypes, bias, and all three gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jperceiver_tpu.ops.pallas.conv3x3 import (
    pallas_conv3x3,
    pallas_conv3x3_valid,
)


def _ref(x, w, b, pad):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + b.astype(y.dtype)


def _rand(rng, shape, dtype):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("c,o", [(8, 16), (16, 8)])
def test_same_conv_forward(dtype, c, o):
    rng = np.random.default_rng(0)
    x = _rand(rng, (2, 16, 24, c), dtype)
    w = _rand(rng, (3, 3, c, o), dtype)
    b = _rand(rng, (o,), dtype)
    got = pallas_conv3x3(x, w, b)
    want = _ref(x, w, b, 1)
    assert got.shape == want.shape == (2, 16, 24, o)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_valid_conv_forward(dtype):
    rng = np.random.default_rng(1)
    c, o = 8, 8
    xp = _rand(rng, (1, 18, 26, c), dtype)  # pre-padded (16+2, 24+2)
    w = _rand(rng, (3, 3, c, o), dtype)
    b = _rand(rng, (o,), dtype)
    got = pallas_conv3x3_valid(xp, w, b)
    want = _ref(xp, w, b, 0)
    assert got.shape == (1, 16, 24, o)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol)


@pytest.mark.parametrize("variant", ["same", "valid"])
def test_conv_gradients_match_xla(variant):
    rng = np.random.default_rng(2)
    c, o = 8, 8
    pad = 1 if variant == "same" else 0
    fn = pallas_conv3x3 if variant == "same" else pallas_conv3x3_valid
    x = _rand(rng, (2, 10, 12, c), jnp.float32)
    w = _rand(rng, (3, 3, c, o), jnp.float32)
    b = _rand(rng, (o,), jnp.float32)
    cot = _rand(rng, (2, 10 + 2 * pad - 2, 12 + 2 * pad - 2, o), jnp.float32)

    def loss(f):
        return lambda x, w, b: jnp.sum(f(x, w, b).astype(jnp.float32) * cot)

    gx, gw, gb = jax.grad(loss(fn), argnums=(0, 1, 2))(x, w, b)
    rx, rw, rb = jax.grad(loss(lambda x, w, b: _ref(x, w, b, pad)),
                          argnums=(0, 1, 2))(x, w, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-4, atol=1e-4)


def test_valid_composes_with_reflect_pad():
    """reflect_pad + VALID kernel == the decoders' ConvReflect3x3 (fwd+bwd)."""
    from jperceiver_tpu.ops.padding import reflect_pad

    rng = np.random.default_rng(3)
    c, o = 8, 8
    x = _rand(rng, (1, 12, 12, c), jnp.float32)
    w = _rand(rng, (3, 3, c, o), jnp.float32)
    b = _rand(rng, (o,), jnp.float32)
    cot = _rand(rng, (1, 12, 12, o), jnp.float32)

    def ours(x, w, b):
        return jnp.sum(pallas_conv3x3_valid(reflect_pad(x), w, b) * cot)

    def ref(x, w, b):
        return jnp.sum(_ref(reflect_pad(x), w, b, 0) * cot)

    np.testing.assert_allclose(float(ours(x, w, b)), float(ref(x, w, b)),
                               rtol=1e-5)
    gx, gw = jax.grad(ours, argnums=(0, 1))(x, w, b)
    rx, rw = jax.grad(ref, argnums=(0, 1))(x, w, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4, atol=1e-4)


def test_odd_height_row_tiling():
    """H with few divisors exercises the row-tile fallback."""
    rng = np.random.default_rng(4)
    x = _rand(rng, (1, 6, 10, 8), jnp.float32)
    w = _rand(rng, (3, 3, 8, 8), jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(pallas_conv3x3(x, w, b)), np.asarray(_ref(x, w, b, 1)),
        rtol=1e-5, atol=1e-5)


def test_model_pallas_conv_path_matches_xla():
    """JPerceiver forward with the Pallas conv path forced (interpret on
    CPU) matches the XLA conv path on the same params."""
    from jperceiver_tpu.data import synthetic_batch
    from jperceiver_tpu.models import JPerceiver
    from jperceiver_tpu.models.common import pallas_conv_scope

    model = JPerceiver(height=128, width=128, occ_map_size=32, branches="road")
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(1, 128, 128, 32).items()}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)

    base = model.apply(variables, batch, train=False)
    with pallas_conv_scope(enabled=True, force=True):
        fast = model.apply(variables, batch, train=False)

    for k in ("disp/0", "topview", "transform_topview"):
        np.testing.assert_allclose(
            np.asarray(base[k]), np.asarray(fast[k]), rtol=2e-4, atol=2e-4,
            err_msg=k)


def test_model_pallas_conv_deep_path_matches_xla():
    """JPerceiver forward with the round-5 DEEP gate forced (interpret on
    CPU; force drops the C>=128 threshold so the small test model still
    exercises the kernel dispatch in Conv3x3 AND _SplitConvInner)."""
    from jperceiver_tpu.data import synthetic_batch
    from jperceiver_tpu.models import JPerceiver
    from jperceiver_tpu.models.common import pallas_conv_deep_scope

    model = JPerceiver(height=128, width=128, occ_map_size=32, branches="road")
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(1, 128, 128, 32).items()}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)

    base = model.apply(variables, batch, train=False)
    with pallas_conv_deep_scope(enabled=True, force=True):
        deep = model.apply(variables, batch, train=False)

    for k in ("disp/0", "topview", "transform_topview"):
        np.testing.assert_allclose(
            np.asarray(base[k]), np.asarray(deep[k]), rtol=2e-4, atol=2e-4,
            err_msg=k)
