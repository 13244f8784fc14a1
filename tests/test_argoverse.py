"""Argoverse dataset on a generated fake log tree (images + calib json)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from jperceiver_tpu.data import Argoverse
from jperceiver_tpu.data.argoverse import load_argo_calibration


@pytest.fixture(scope="module")
def fake_argo(tmp_path_factory):
    root = tmp_path_factory.mktemp("argo")
    log = root / "argoverse-tracking" / "train1" / "log01"
    for sub in ("stereo_front_left", "road_gt_new", "car_bev_gt_new",
                "both_bev_gt_new"):
        (log / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    stamps = [315976037656045152, 315976037656045652, 315976037656046152]
    for ts in stamps:
        img = rng.uniform(0, 255, (77, 92, 3)).astype(np.uint8)
        Image.fromarray(img).save(
            log / "stereo_front_left" / f"stereo_front_left_{ts}.jpg"
        )
        lbl = np.zeros((128, 128), np.uint8)
        lbl[64:120, 30:100] = 255
        for sub in ("road_gt_new", "car_bev_gt_new", "both_bev_gt_new"):
            Image.fromarray(lbl).save(log / sub / f"stereo_front_left_{ts}.png")
    calib = {
        "camera_data_": [
            {
                "key": "image_raw_stereo_front_left",
                "value": {
                    "focal_length_x_px_": 3666.5,
                    "focal_length_y_px_": 3666.5,
                    "focal_center_x_px_": 1235.0,
                    "focal_center_y_px_": 1029.0,
                    "skew_": 0.0,
                    "vehicle_SE3_camera_": {
                        "rotation": {"coefficients": [0.5, -0.5, 0.5, -0.5]},
                        "translation": [1.35, 0.26, 1.45],
                    },
                },
            }
        ]
    }
    with open(log / "vehicle_calibration_info.json", "w") as f:
        json.dump(calib, f)
    return root, stamps


def test_argo_calibration(fake_argo):
    root, stamps = fake_argo
    log_dir = os.path.join(root, "argoverse-tracking/train1/log01")
    K, ext = load_argo_calibration(log_dir)
    assert np.isclose(K[0, 0], 3666.5)
    R = ext[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    # camera_SE3_egovehicle maps ego->camera; camera center in ego frame is
    # the calib translation, so ext @ [t;1] = 0.
    t = np.array([1.35, 0.26, 1.45, 1.0])
    np.testing.assert_allclose((ext @ t)[:3], 0, atol=1e-6)


def test_argo_sample_schema(fake_argo):
    root, stamps = fake_argo
    rel = f"argoverse-tracking/train1/log01/road_gt_new/stereo_front_left_{stamps[0]}.png"
    line = " ".join([
        rel,
        rel.replace(str(stamps[0]), str(stamps[1])),
        rel.replace(str(stamps[0]), str(stamps[2])),
    ])
    ds = Argoverse(str(root), [line], height=128, width=128,
                   type="Argo_both", is_train=True, with_sdf=True)
    s = ds[0]
    assert s["color"].shape == (3, 128, 128, 3)
    assert s["bev_static"].sum() > 0
    assert s["bev_dynamic"].sum() > 0
    assert s["bev_both"].sum() > 0
    assert s["bev_static_sdf"].shape == (32, 32, 1)
    # K rescaled from the calib to the working resolution.
    assert np.isclose(s["K"][0, 0], 3666.5 * 128 / 2464, rtol=1e-5)
    assert s["odometry_K"][0, 0] == np.float32(3666.5)


def test_argo_val_single_path(fake_argo):
    root, stamps = fake_argo
    rel = f"argoverse-tracking/train1/log01/road_gt_new/stereo_front_left_{stamps[0]}.png"
    ds = Argoverse(str(root), [rel], height=128, width=128,
                   type="Argo_static", is_train=False)
    s = ds[0]
    assert s["color"].shape == (3, 128, 128, 3)
    assert s["bev_static"].sum() > 0
