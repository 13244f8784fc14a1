"""Preset families: the 52 reference config permutations build and map.

Parity target: `/root/reference/config/cfg_kitti_baseline*.py` (52 files,
one schema) -> `jperceiver_tpu/config/families.py`.
"""

import pytest

from jperceiver_tpu.config import build_family, family_axes, list_families
from jperceiver_tpu.config.config import Config


def test_every_reference_config_has_a_family():
    names = list_families()
    assert len(names) == 52
    # spot anchors from the reference tree
    for anchor in (
        "base",
        "odometry_boundary_ce_iou_1024_20",
        "odometry_boundary_ce_iou_1024_20_B1",
        "argo_both_boundary_ce_iou_1024_20_B1",
        "kitti_odom_object_focal_1024",
        "raw_tversky_1024_20",
        "kitti_odom_8pugsB24_lr1e-4_ce_eigen",
    ):
        assert anchor in names


def test_all_families_build_valid_configs():
    for n in list_families():
        cfg = build_family(n)
        assert isinstance(cfg, Config)
        assert cfg.model.loss_sum in (1, 2, 3)
        assert cfg.model.type in (
            "static", "static_raw", "dynamic",
            "Argo_static", "Argo_dynamic", "Argo_both")
        assert cfg.model.height in (192, 512, 1024)
        assert cfg.model.loss_type in ("iou", "dice", "focal", "tversky")


def test_flagship_family_matches_reference_axes():
    """`odometry_boundary_ce_iou_1024_20` == the flagship reference file
    (`config/cfg_kitti_baseline_odometry_boundary_ce_iou_1024_20.py`)."""
    cfg = build_family("odometry_boundary_ce_iou_1024_20")
    m = cfg.model
    assert (m.height, m.width, m.occ_map_size) == (1024, 1024, 256)
    assert m.imgs_per_gpu == 3
    assert (m.loss_type, m.loss2_type, m.loss_sum) == ("iou", "boundary", 3)
    assert m.loss_weight == 20 and m.loss2_weight == 20
    assert cfg.total_epochs == 180
    assert cfg.lr_config.step == [50]
    assert cfg.learning_rate == 1e-4
    assert m.frame_ids == [0, -1, 1]
    assert m.type == "static" and m.split == "odometry"


def test_eigen_family_normalized_to_static_raw():
    cfg = build_family("kitti_odom_4pugsB12_lr1e-4_ce_eigen")
    assert cfg.model.type == "static_raw"
    assert cfg.data.split == "eigen_full"
    assert family_axes("kitti_odom_4pugsB12_lr1e-4_ce_eigen")["legacy"]


def test_overrides_apply():
    cfg = build_family("base", total_epochs=3)
    assert cfg.total_epochs == 3


def test_legacy_loss_sum_normalization():
    """loss_sum in {0, None, False} upstream leaves the loss unbound
    (`net.py:576-583`); True compares ==1. All normalize to 1 here."""
    for n in list_families():
        ax = family_axes(n)
        assert ax["lsum"] in (1, 2, 3)


def test_b1_family_two_frames():
    cfg = build_family("odometry_boundary_ce_iou_1024_20_B1")
    assert cfg.model.frame_ids == [0, -1]
    assert cfg.imgs_per_gpu == 1


def test_train_cli_accepts_family_flag():
    """--family resolves through config.families (argparse contract only)."""
    from jperceiver_tpu.tools.train import parse_args

    args = parse_args(["--family", "odometry_boundary_ce_iou_1024_20",
                       "--work_dir", "/tmp/x"])
    assert args.family == "odometry_boundary_ce_iou_1024_20"
    assert args.config is None


def test_every_family_model_config_builds_a_model():
    """build_model accepts each family's model dict (no init, shape-only)."""
    from jperceiver_tpu.models import build_model

    for n in list_families():
        cfg = build_family(n)
        m = build_model(cfg.model)
        assert m.height == cfg.model.height
