"""Packaged dataset artifacts: split lists + KITTI gt_pose.

The reference ships its split files and GT poses in-repo
(`mono/datasets/splits/`, `mono/datasets/gt_pose/00..12.txt`); we package
the five split families the shipped configs use plus the 12 GT pose files
under `jperceiver_tpu/data/artifacts/` (provenance in its README).
"""

import os

import numpy as np

from jperceiver_tpu.data.splits import (
    default_gt_pose_dir,
    default_split_dir,
    readlines,
    split_file,
)


def test_packaged_splits_present_and_nonempty():
    d = default_split_dir()
    assert d is not None
    for split in ("odometry", "raw", "3Dobject", "argo", "eigen_full"):
        for training in (True, False):
            path = split_file(d, split, training)
            lines = readlines(path)
            assert len(lines) > 10, f"{path} suspiciously short"


def test_packaged_splits_match_reference_counts():
    """Line counts equal the reference's own lists (verbatim data copies)."""
    ref = "/root/reference/mono/datasets/splits"
    if not os.path.isdir(ref):
        import pytest

        pytest.skip("reference tree not available")
    d = default_split_dir()
    for split in ("odometry", "raw", "3Dobject", "argo", "eigen_full"):
        for name in ("train_files.txt", "val_files.txt"):
            ours = readlines(os.path.join(d, split, name))
            theirs = readlines(os.path.join(ref, split, name))
            assert ours == theirs, f"{split}/{name} differs from reference"


def test_gt_pose_loads_and_self_eval_is_zero():
    """GT poses parse as KITTI 3x4 rows; evaluating GT against itself
    through the odometry toolkit gives ~0 segment error."""
    import shutil
    import tempfile

    from jperceiver_tpu.evaluation.kitti_odometry import KittiOdomEval

    d = default_gt_pose_dir()
    assert d is not None
    files = sorted(os.listdir(d))
    # The reference ships 00-10 and 12 (no 11.txt — KITTI's public GT
    # covers 00-10; 12 is the authors' extra); copied verbatim.
    expected = [f"{i:02d}.txt" for i in list(range(11)) + [12]]
    assert expected == files

    arr = np.loadtxt(os.path.join(d, "09.txt"))
    assert arr.ndim == 2 and arr.shape[1] == 12 and arr.shape[0] > 1000

    with tempfile.TemporaryDirectory() as tmp:
        shutil.copy(os.path.join(d, "09.txt"), tmp)
        ev = KittiOdomEval(d, tmp, align_scale=True)
        res = ev.eval_sequence("09")
        assert res["n_segments"] > 0
        assert res["t_rel_percent"] < 1e-6
        assert res["r_rel_deg_per_100m"] < 1e-6
