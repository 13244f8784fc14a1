"""End-to-end acceptance pipeline on the 8-device CPU mesh (tiny config).

Drives `tools/acceptance.py`: simulated-scene training through the real
train CLI, checkpoint restore, EvalHook metrics vs analytic GT, and the
odometry toolkit over a rendered 110 m drive. The real-chip counterpart
(256^2, hundreds of steps) is run manually; its numbers live in DESIGN.md.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_acceptance_pipeline(tmp_path):
    from jperceiver_tpu.tools.acceptance import main

    wd = tmp_path / "acc"
    results = main([
        "--work_dir", str(wd),
        "--height", "128",
        "--n_scenes", "8",
        "--imgs_per_gpu", "1",
        "--epochs", "1",
        "--odom_frames", "110",
    ])

    # Stage 1+2: trained, checkpointed, restored, evaluated.
    assert results["restored_epoch"] == 1
    ev = results["eval"]
    assert np.isfinite(ev["abs_rel"]) and ev["abs_rel"] > 0
    assert "road_iou" in ev
    # Stage 3: odometry toolkit produced segment errors over >=100 m.
    od = results["odometry"]
    assert od["n_segments"] >= 1
    assert np.isfinite(od["t_rel_percent"])
    # Artifacts on disk: acceptance.json, predicted poses, trajectory plot.
    assert (wd / "acceptance.json").is_file()
    assert (wd / "odom" / "21.txt").is_file()
    assert (wd / "odom" / "21.png").is_file()
    on_disk = json.load(open(wd / "acceptance.json"))
    assert on_disk["eval"] == results["eval"]


def test_acceptance_pipeline_dynamic(tmp_path):
    """Vehicle branch through the same gate (VERDICT r3 item 6): simulated
    vehicle footprints, dynamic CGT kind, boundary-loss loss_sum=3
    composite on the vehicle labels, vehicle_iou in eval."""
    from jperceiver_tpu.tools.acceptance import main

    wd = tmp_path / "acc_dyn"
    results = main([
        "--work_dir", str(wd),
        "--type", "dynamic",
        "--height", "128",
        "--n_scenes", "8",
        "--imgs_per_gpu", "1",
        "--epochs", "1",
        "--odom_frames", "110",
    ])
    assert results["type"] == "dynamic"
    assert results["restored_epoch"] == 1
    ev = results["eval"]
    assert np.isfinite(ev["abs_rel"]) and ev["abs_rel"] > 0
    assert "vehicle_iou" in ev and np.isfinite(ev["vehicle_iou"])
    assert results["odometry"]["n_segments"] >= 1


def test_acceptance_pipeline_argo_both(tmp_path):
    """Dual-branch Argoverse semantics end to end: both-kind CGT at the
    0.33 m camera height, both branches trained and evaluated."""
    from jperceiver_tpu.tools.acceptance import main

    wd = tmp_path / "acc_both"
    results = main([
        "--work_dir", str(wd),
        "--type", "Argo_both",
        "--height", "128",
        "--n_scenes", "8",
        "--imgs_per_gpu", "1",
        "--epochs", "1",
        "--odom_frames", "110",
    ])
    assert results["type"] == "Argo_both"
    ev = results["eval"]
    assert np.isfinite(ev["abs_rel"]) and ev["abs_rel"] > 0
    # Dual-branch eval: BOTH layout metrics present.
    assert "road_iou" in ev and "vehicle_iou" in ev
    assert results["odometry"]["n_segments"] >= 1
