"""Custom-backward 5x5 max-pool: parity vs XLA reduce_window + autodiff."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from jperceiver_tpu.ops.pallas.maxpool import _pool_ref, max_pool_5x5_s1


def test_forward_matches_torch(rng):
    x = rng.standard_normal((2, 16, 20, 8)).astype(np.float32)
    ours = np.asarray(max_pool_5x5_s1(jnp.asarray(x)))
    ref = F.max_pool2d(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), 5, 1, 2
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours, ref)


def test_backward_matches_xla_autodiff(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))

    def loss_custom(x):
        return jnp.sum(max_pool_5x5_s1(x) ** 2)

    def loss_ref(x):
        return jnp.sum(_pool_ref(x) ** 2)

    g_c = jax.grad(loss_custom)(x)
    g_r = jax.grad(loss_ref)(x)
    # The separable backward sums each input's contributions grouped by
    # axis (col-stage partial sums first), so fp32 reassociation introduces
    # ulp-level differences vs the flat 25-term sum.
    np.testing.assert_allclose(
        np.asarray(g_c), np.asarray(g_r), rtol=1e-5, atol=1e-6)


def test_backward_gradient_conservation(rng):
    """Sum of dx equals sum of dy (each output routes to exactly one input
    when there are no ties)."""
    x = jnp.asarray(rng.standard_normal((1, 12, 12, 4)).astype(np.float32))
    dy_sum = float(jnp.sum(jnp.ones_like(x)))
    g = jax.grad(lambda x: jnp.sum(max_pool_5x5_s1(x)))(x)
    assert np.isclose(float(jnp.sum(g)), dy_sum)


def test_stem_pool3s2_forward_matches_torch(rng):
    from jperceiver_tpu.ops.pallas.maxpool import max_pool_3x3_s2

    for h, w in [(16, 20), (17, 23)]:
        x = rng.standard_normal((2, h, w, 8)).astype(np.float32)
        ours = np.asarray(max_pool_3x3_s2(jnp.asarray(x)))
        ref = F.max_pool2d(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), 3, 2, 1
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_array_equal(ours, ref)


def test_stem_pool3s2_backward_matches_xla(rng):
    from jperceiver_tpu.ops.pallas.maxpool import _pool3s2_ref, max_pool_3x3_s2

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    g_c = jax.grad(lambda x: jnp.sum(max_pool_3x3_s2(x) ** 2))(x)
    g_r = jax.grad(lambda x: jnp.sum(_pool3s2_ref(x) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_r),
                               rtol=1e-5, atol=1e-6)
