"""Data-parallel correctness: sharded step == unsharded step.

The distributed design's core claim (DESIGN.md L4): gradient averaging is
emitted by sharded autodiff, so an 8-way sharded batch must produce the
same update as the same batch on one device (up to fp reduction order).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jperceiver_tpu.config import Config
from jperceiver_tpu.data import synthetic_batch
from jperceiver_tpu.engine import build_optimizer, create_train_state, make_train_step
from jperceiver_tpu.models import JPerceiver
from jperceiver_tpu.parallel import make_mesh, shard_batch

pytestmark = pytest.mark.slow


def _cfg(h=128, w=128, s=32):
    return Config.fromdict(dict(
        type="static", split="odometry", frame_ids=[0, -1, 1],
        scales=[0, 1, 2, 3], height=h, width=w, occ_map_size=s, num_class=2,
        min_depth=0.1, max_depth=100.0, automask=False, disp_norm=True,
        smoothness_weight=1e-3, scale_weight=0.1, loss_type="iou",
        loss_sum=1, loss_weight=1.0, cgt_label_hw=(94, 310),
        optimizer=dict(type="Adam", lr=1e-4, weight_decay=0),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(policy="step", warmup=None, step=[50]),
    ))


def test_sharded_equals_unsharded():
    cfg = _cfg()
    model = JPerceiver(height=cfg.height, width=cfg.width,
                       occ_map_size=cfg.occ_map_size)
    raw = synthetic_batch(8, cfg.height, cfg.width, cfg.occ_map_size)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    tx, _ = build_optimizer(cfg, 100)
    # automask=False so the loss is rng-independent up to dropout, and we
    # drive eval-mode-free training with the same fold_in on both paths.
    state0 = create_train_state(model, tx, batch, jax.random.key(0))
    step = make_train_step(model, cfg, donate=False)

    _, m_single = step(state0, batch, jax.random.key(7))

    mesh = make_mesh()
    sharded = shard_batch(mesh, batch)
    _, m_shard = step(state0, sharded, jax.random.key(7))

    for k in ("loss", "topview_loss", "min_reconstruct_loss/0"):
        a, b = float(m_single[k]), float(m_shard[k])
        assert np.isclose(a, b, rtol=1e-4), (k, a, b)


def test_two_frame_config():
    """frame_ids=[0,-1] (the reference's 2-frame axis) trains."""
    cfg = _cfg()
    cfg["frame_ids"] = [0, -1]
    model = JPerceiver(height=cfg.height, width=cfg.width,
                       occ_map_size=cfg.occ_map_size, frame_ids=(0, -1))
    raw = synthetic_batch(1, cfg.height, cfg.width, cfg.occ_map_size,
                          num_frames=2)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    tx, _ = build_optimizer(cfg, 100)
    state = create_train_state(model, tx, batch, jax.random.key(0))
    step = make_train_step(model, cfg, donate=False)
    _, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert "cam_T_cam/1" not in metrics


def test_kitti_object_dataset(tmp_path):
    from PIL import Image

    from jperceiver_tpu.data import KittiObject

    rng = np.random.default_rng(0)
    for sub in ("training/image_2", "training/vehicle_256", "training/calib"):
        (tmp_path / sub).mkdir(parents=True)
    for i in range(3):
        img = rng.uniform(0, 255, (48, 160, 3)).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "training/image_2" / f"{i:06d}.png")
        lbl = np.zeros((128, 128), np.uint8)
        lbl[70:90, 55:75] = 255
        Image.fromarray(lbl).save(tmp_path / "training/vehicle_256" / f"{i:06d}.png")
        with open(tmp_path / "training/calib" / f"{i:06d}.txt", "w") as f:
            f.write("P2: 707 0 601 45 0 707 183 0 0 0 1 0\n")
            f.write("Tr_velo_to_cam: 0 -1 0 0 0 0 -1 -0.08 1 0 0 -0.27\n")

    ds = KittiObject(str(tmp_path), ["000001"], height=128, width=128,
                     is_train=False)
    s = ds[0]
    assert s["bev_dynamic"].sum() > 0
    assert s["bev_static"].sum() == 0  # object set has vehicle labels only
    assert np.isclose(s["odometry_K"][0, 0], 707.0)
    R = s["Tr_cam2_velo"][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_sharded_equals_unsharded_dots_lowerings():
    """Same DP-correctness claim with the TPU-default conv lowerings
    forced on (nine-dot + shallow tapcat + stride-2 dots): the shifted
    strided slices and lane-concat einsums must partition over the batch
    axis without changing the math."""
    cfg = _cfg()
    cfg.conv3x3_dots = True
    cfg.conv3x3_tapcat_max_ch = 32
    model = JPerceiver(height=cfg.height, width=cfg.width,
                       occ_map_size=cfg.occ_map_size)
    raw = synthetic_batch(8, cfg.height, cfg.width, cfg.occ_map_size)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    tx, _ = build_optimizer(cfg, 100)
    state0 = create_train_state(model, tx, batch, jax.random.key(0))
    step = make_train_step(model, cfg, donate=False)

    _, m_single = step(state0, batch, jax.random.key(7))

    mesh = make_mesh()
    sharded = shard_batch(mesh, batch)
    _, m_shard = step(state0, sharded, jax.random.key(7))

    for k in ("loss", "topview_loss", "min_reconstruct_loss/0"):
        a, b = float(m_single[k]), float(m_shard[k])
        assert np.isclose(a, b, rtol=1e-4), (k, a, b)
