"""Stereo ('s') frame support: model + loss + data conventions.

The reference's stereo path is half-dead code (its dataset branch
references an undefined `side`, `mono_dataset.py:216`), but the config
axis exists (`FRAME_IDS` comments, `stereo_scale`, the x36 eval ratio);
here it is implemented with monodepth2's fixed 0.1-baseline convention.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jperceiver_tpu.config import Config
from jperceiver_tpu.data import synthetic_batch
from jperceiver_tpu.losses import compute_losses, total_loss
from jperceiver_tpu.models import JPerceiver


@pytest.fixture(scope="module")
def stereo_setup():
    H = W = 128
    S = 32
    b = synthetic_batch(1, H, W, S)
    st = np.eye(4, dtype=np.float32)
    st[0, 3] = -0.1
    b["stereo_T"] = np.tile(st[None], (1, 1, 1))
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    model = JPerceiver(height=H, width=W, occ_map_size=S, frame_ids=(0, -1, "s"))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=True,
    )
    out, _ = model.apply(
        variables, batch, train=True,
        rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"],
    )
    return batch, out


def test_stereo_frame_has_no_pose(stereo_setup):
    _, out = stereo_setup
    assert "cam_T_cam/-1" in out
    assert "cam_T_cam/s" not in out


def test_stereo_loss_finite(stereo_setup):
    batch, out = stereo_setup
    cfg = Config.fromdict(dict(
        type="static", split="odometry", frame_ids=[0, -1, "s"],
        scales=[0, 1, 2, 3], height=128, width=128, occ_map_size=32,
        num_class=2, min_depth=0.1, max_depth=100.0,
        # reference convention: automask/disp_norm off with stereo frames
        automask=False, disp_norm=False,
        loss_type="iou", loss_sum=1, loss_weight=1, cgt_label_hw=(94, 310),
    ))
    ld = compute_losses(out, batch, cfg, jax.random.key(3))
    tl = float(total_loss(ld))
    assert np.isfinite(tl)
    # without automask there are no identity terms; reprojection still
    # covers both the temporal and the stereo frame
    assert "min_reconstruct_loss/0" in ld


def test_stereo_data_convention(tmp_path):
    """KittiRaw emits stereo_T with the side/flip sign rule."""
    from PIL import Image

    from jperceiver_tpu.data import KittiRaw

    root = tmp_path
    drive = root / "2011_09_26" / "2011_09_26_drive_0001_sync"
    for sub in ("image_02/data", "image_03/data", "road_256/road_256"):
        (drive / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.uniform(0, 255, (40, 120, 3)).astype(np.uint8)
        Image.fromarray(img).save(drive / "image_02/data" / f"{i:010d}.png")
        Image.fromarray(img[:, ::-1]).save(drive / "image_03/data" / f"{i:010d}.png")
        lbl = np.zeros((128, 128), np.uint8)
        lbl[60:, 40:90] = 255
        Image.fromarray(lbl).save(drive / "road_256/road_256" / f"{i:010d}.png")
    with open(root / "2011_09_26" / "calib_cam_to_cam.txt", "w") as f:
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write("P_rect_02: 700 0 600 45 0 700 180 0 0 0 1 0\n")
        f.write("S_rect_02: 1242 375\n")
    with open(root / "2011_09_26" / "calib_velo_to_cam.txt", "w") as f:
        f.write("R: 0 -1 0 0 0 -1 1 0 0\nT: 0 0 0\n")

    ds = KittiRaw(
        str(root),
        ["2011_09_26/2011_09_26_drive_0001_sync/image_02/data/0000000001.png"],
        height=128, width=128, frame_ids=(0, -1, "s"), is_train=False,
    )
    s = ds[0]
    assert s["color"].shape == (3, 128, 128, 3)
    assert "stereo_T" in s
    assert np.isclose(abs(s["stereo_T"][0, 3]), 0.1)
