"""Parity: fused Pallas reprojection loss vs the pure-XLA chain.

Runs in interpret mode on CPU; the same code compiles on TPU. The grad
check is the load-bearing one — it validates the in-kernel grad-of-closure
backward AND the reflect-ring/corner fixups against plain autodiff of the
reference chain (`ops/photometric.py` + frame-min).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jperceiver_tpu.ops.pallas.reproj import (
    reproj_min_pallas,
    reproj_min_reference,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _mk(rng, s=2, b=1, f=2, c=3, h=24, w=20):
    preds = jnp.asarray(rng.random((s, b, f, c, h, w)).astype(np.float32))
    targ = jnp.asarray(rng.random((b, c, h, w)).astype(np.float32))
    return preds, targ


def test_fwd_parity(rng):
    preds, targ = _mk(rng)
    got = reproj_min_pallas(preds, targ, 8)
    want = reproj_min_reference(preds, targ)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fwd_parity_single_block_and_odd_sizes(rng):
    preds, targ = _mk(rng, s=1, f=3, h=12, w=17)
    got = reproj_min_pallas(preds, targ, 64)
    want = reproj_min_reference(preds, targ)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_grad_parity(rng):
    """The whole backward: kernel interior + ring folds + corner fixups."""
    preds, targ = _mk(rng, s=2, b=2, f=2, h=24, w=20)
    cot = jnp.asarray(rng.standard_normal((2, 2, 24, 20)).astype(np.float32))

    def loss_pallas(p):
        return jnp.sum(reproj_min_pallas(p, targ, 8) * cot)

    def loss_ref(p):
        return jnp.sum(reproj_min_reference(p, targ) * cot)

    g_got = jax.grad(loss_pallas)(preds)
    g_want = jax.grad(loss_ref)(preds)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_grad_parity_bf16_inputs(rng):
    preds, targ = _mk(rng, h=16, w=12)
    predsb = preds.astype(jnp.bfloat16)
    targb = targ.astype(jnp.bfloat16)
    cot = jnp.asarray(rng.standard_normal((2, 1, 16, 12)).astype(np.float32))

    g_got = jax.grad(
        lambda p: jnp.sum(reproj_min_pallas(p, targb, 8) * cot))(predsb)
    g_want = jax.grad(
        lambda p: jnp.sum(reproj_min_reference(
            p.astype(jnp.float32), targb.astype(jnp.float32)) * cot)
    )(predsb.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(g_got, np.float32), np.asarray(g_want),
        rtol=2e-2, atol=2e-2)


def test_sharded_dp_parity(rng):
    """Batch-sharded over the 8-device mesh: the custom_partitioning
    wrapper must run the kernel shard-locally (no all-gather, no
    interpret-mode collective deadlock) and match the replicated grads."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    preds, targ = _mk(rng, s=2, b=8, f=2, h=16, w=32)
    cot_np = rng.standard_normal((2, 8, 16, 32)).astype(np.float32)
    cot = jnp.asarray(cot_np)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    preds_s = jax.device_put(preds, NamedSharding(mesh, P(None, "data")))
    targ_s = jax.device_put(targ, NamedSharding(mesh, P("data")))

    def loss_p(p, t):
        return jnp.sum(reproj_min_pallas(p, t, 8) * cot)

    v = jax.jit(loss_p)(preds_s, targ_s)
    g = jax.jit(jax.grad(loss_p))(preds_s, targ_s)

    v_ref = jnp.sum(reproj_min_reference(preds, targ) * cot)
    g_ref = jax.grad(
        lambda p: jnp.sum(reproj_min_reference(p, targ) * cot))(preds)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_compute_losses_knob_equivalence(rng):
    """cfg.use_pallas_reproj reproduces the stacked-min photometric terms
    inside the full multi-task loss (same rng => same automask noise)."""
    from jperceiver_tpu.config import Config
    from jperceiver_tpu.losses.multitask import compute_losses

    h = w = 64
    s_occ = 16
    base = dict(
        type="static", split="odometry", frame_ids=[0, -1, 1],
        scales=[0, 1, 2, 3], height=h, width=w, occ_map_size=s_occ,
        num_class=2, min_depth=0.1, max_depth=100.0, automask=True,
        disp_norm=True, loss_type="iou", loss_sum=1, loss_weight=1.0,
        cgt_label_hw=(48, 156),
    )
    b = 2
    outputs = {}
    for sc in range(4):
        outputs[f"disp/{sc}"] = jnp.asarray(
            rng.random((b, h // 2 ** (sc + 1), w // 2 ** (sc + 1), 1))
            .astype(np.float32))
    for f in (-1, 1):
        t = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
        t[:, 0, 3] = 0.01 * f
        outputs[f"cam_T_cam/{f}"] = jnp.asarray(t)
    outputs.update(
        topview=jnp.asarray(rng.random((b, s_occ, s_occ, 2)).astype(np.float32)),
        transform_topview=jnp.asarray(
            rng.random((b, s_occ, s_occ, 2)).astype(np.float32)),
        features=jnp.asarray(rng.random((b, 4, 4, 8)).astype(np.float32)),
        retransform_features=jnp.asarray(
            rng.random((b, 4, 4, 8)).astype(np.float32)),
    )
    K = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    K[:, 0, 0] = K[:, 1, 1] = 30.0
    K[:, 0, 2] = w / 2
    K[:, 1, 2] = h / 2
    batch = dict(
        color=jnp.asarray(rng.random((b, 3, h, w, 3)).astype(np.float32)),
        K=jnp.asarray(K), inv_K=jnp.asarray(np.linalg.inv(K)),
        odometry_K=jnp.asarray(K),
        Tr_cam2_velo=jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))),
        bev_static=jnp.asarray(
            (rng.random((b, s_occ, s_occ)) > 0.5).astype(np.int32)),
    )
    key = jax.random.key(3)
    ld_ref = compute_losses(outputs, batch, Config.fromdict(dict(base)), key)
    ld_pal = compute_losses(
        outputs, batch, Config.fromdict(dict(base, use_pallas_reproj=True)),
        key)
    assert ld_ref.keys() == ld_pal.keys()
    for k in ld_ref:
        a, bv = float(ld_ref[k]), float(ld_pal[k])
        assert np.isclose(a, bv, rtol=1e-4, atol=1e-5), (k, a, bv)
