"""End-to-end training-step tests: overfit sanity + 8-device sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jperceiver_tpu.config import Config
from jperceiver_tpu.data import synthetic_batch
from jperceiver_tpu.engine import (
    build_optimizer,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from jperceiver_tpu.models import JPerceiver
from jperceiver_tpu.parallel import make_mesh, shard_batch

pytestmark = pytest.mark.slow


def tiny_cfg(h=128, w=128, s=32, loss_sum=1):
    return Config.fromdict(
        dict(
            type="static",
            split="odometry",
            frame_ids=[0, -1, 1],
            scales=[0, 1, 2, 3],
            height=h,
            width=w,
            occ_map_size=s,
            num_class=2,
            min_depth=0.1,
            max_depth=100.0,
            automask=True,
            disp_norm=True,
            smoothness_weight=1e-3,
            scale_weight=0.1,
            static_weight=5.0,
            dynamic_weight=15.0,
            loss_type="iou",
            loss_sum=loss_sum,
            loss_weight=1.0,
            loss2_weight=1.0,
            cgt_label_hw=(188, 621),  # half-res label: CPU test speed
            optimizer=dict(type="Adam", lr=1e-4, weight_decay=0),
            optimizer_config=dict(grad_clip=dict(max_norm=35, norm_type=2)),
            lr_config=dict(policy="step", warmup=None, step=[50]),
        )
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = JPerceiver(height=cfg.height, width=cfg.width, occ_map_size=cfg.occ_map_size)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(2, cfg.height, cfg.width, cfg.occ_map_size).items()
    }
    tx, _ = build_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(model, tx, batch, jax.random.key(0))
    return cfg, model, batch, state


def test_train_step_overfits_synthetic(setup):
    cfg, model, batch, state = setup
    step = make_train_step(model, cfg, donate=False)
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.key(42))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    # Optimizing a fixed batch must reduce the objective. Adam's first
    # steps transiently SPIKE the loss from a random init (step-2 values
    # ~4x step-1 are normal), so assert on the settled tail, not on a
    # single step-k value — the old losses[-1] < losses[0] at 6 steps
    # flipped on ulp-level op reassociation (trajectory chaos, bisected
    # to an exact-rewrite commit in round 3).
    assert min(losses[6:]) < losses[0], losses
    assert float(metrics["grad_norm"]) > 0


def test_eval_step_outputs(setup):
    cfg, model, batch, state = setup
    estep = make_eval_step(model)
    out = estep(state, batch)
    assert out["disp/0"].shape == (2, cfg.height // 2, cfg.width // 2, 1)
    assert out["topview"].shape == (2, cfg.occ_map_size, cfg.occ_map_size, 2)
    assert np.isfinite(np.asarray(out["disp/0"])).all()


def test_sharded_train_step_8_devices():
    """Data-parallel step over the 8-device CPU mesh (driver parity)."""
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    cfg = tiny_cfg()
    model = JPerceiver(height=cfg.height, width=cfg.width, occ_map_size=cfg.occ_map_size)
    mesh = make_mesh()
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(8, cfg.height, cfg.width, cfg.occ_map_size).items()
    }
    batch = shard_batch(mesh, batch)
    tx, _ = build_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(model, tx, batch, jax.random.key(0))
    step = make_train_step(model, cfg, donate=False)
    new_state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    # Params remain replicated; batch stays sharded over 'data'.
    p = jax.tree_util.tree_leaves(new_state.params)[0]
    assert p.sharding.is_fully_replicated


def test_adam_mu_dtype_knob():
    """optimizer.mu_dtype="bfloat16" casts the first moment only."""
    import optax  # noqa: F401 (knob resolves through optax.adam)

    cfg = tiny_cfg()
    cfg.optimizer = dict(type="Adam", lr=1e-4, mu_dtype="bfloat16")
    tx, _ = build_optimizer(cfg, 100)
    params = {"w": jnp.ones((4, 4), jnp.float32)}
    st = tx.init(params)
    dtypes = {str(x.dtype) for x in jax.tree_util.tree_leaves(st)
              if hasattr(x, "dtype") and x.ndim > 0}
    assert "bfloat16" in dtypes  # mu
    u, _ = tx.update({"w": jnp.full((4, 4), 0.1)}, st, params)
    assert np.isfinite(np.asarray(u["w"])).all()
