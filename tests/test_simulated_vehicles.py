"""Simulated vehicle scenes (dynamic / Argo_both acceptance support).

Validates the painted-footprint vehicle extension of `data/simulated.py`:
footprints are visible in the image, consistently rasterized in BEV, carry
a real SDF for the boundary loss, and — because the paint lies ON the
ground plane, exactly the assumption the reference's dynamic CGT makes
(`net.py:380-476`) — the dynamic-kind CGT label still equals true metric
depth inside its assumption region.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jperceiver_tpu.data.simulated import (ARGO_CAMERA_HEIGHT, SimulatedDataset,
                                           render_scene)
from jperceiver_tpu.losses.cgt import cgt_scale_label

pytestmark = pytest.mark.slow


def test_vehicle_scene_labels_and_visibility():
    s, _ = render_scene(1, 128, 128, model_type="dynamic")
    st, _ = render_scene(1, 128, 128, model_type="static")
    bd = s["bev_dynamic"]
    assert bd.sum() > 0, "no vehicle footprint in BEV"
    assert set(np.unique(bd)) <= {0.0, 1.0}
    # The paint shows up in the image (the layout net must SEE vehicles).
    diff = np.abs(s["color"][0] - st["color"][0]).max(-1)
    assert (diff > 0.05).sum() > 50
    # Paint is world-anchored: all three frames carry it.
    for i in range(3):
        di = np.abs(s["color"][i] - st["color"][i]).max(-1)
        assert (di > 0.05).sum() > 0
    # Real SDF (negative inside, positive outside), not the zeros stub.
    sdf = s["bev_dynamic_sdf"]
    assert sdf.shape == (32, 32, 1)
    assert sdf.min() < 0 < sdf.max()


def test_static_scene_keeps_empty_dynamic_labels():
    s, _ = render_scene(1, 128, 128, model_type="static")
    assert s["bev_dynamic"].sum() == 0
    assert np.all(s["bev_dynamic_sdf"] == 0)


def test_argo_scene_uses_low_camera():
    s, gt = render_scene(3, 128, 128, model_type="Argo_both", split="argo")
    # Ground depth at the bottom image row must reflect the 0.33 m camera:
    # depth = cam_height / vp with vp ~ 0.55 at the last row -> sub-meter.
    assert gt["depth"][-1].min() < ARGO_CAMERA_HEIGHT / 0.5
    assert s["bev_dynamic"].sum() > 0


def test_dynamic_cgt_label_matches_true_depth():
    """kind='dynamic' CGT = distance ramp masked to the assumption quad;
    on the simulated ground plane that must equal true depth (the KITTI
    dynamic ramp carries no offset, `net.py:230-233`)."""
    s, gt = render_scene(2, 256, 256, model_type="dynamic")
    lbl = np.asarray(cgt_scale_label(
        None,
        jnp.asarray(s["odometry_K"][None, :3, :3]),
        jnp.asarray(s["Tr_cam2_velo"][None]),
        kind="dynamic", split="odometry", occ_map_size=64,
        out_hw=(256, 256),
    ))[0, :, :, 0]
    mask = lbl > 0
    assert 0.0005 < mask.mean() < 0.2, (
        f"assumption-quad support off: {mask.mean():.4f}")
    rel = np.abs(lbl[mask] - gt["depth"][mask]) / gt["depth"][mask]
    assert np.median(rel) < 0.10, (
        f"dynamic CGT label off: median rel err {np.median(rel):.3f}")


def test_dataset_plumbs_model_type():
    ds = SimulatedDataset(n_scenes=2, height=128, width=128,
                          model_type="dynamic")
    assert ds[0]["bev_dynamic"].sum() > 0
    ds_s = SimulatedDataset(n_scenes=2, height=128, width=128)
    assert ds_s[0]["bev_dynamic"].sum() == 0
