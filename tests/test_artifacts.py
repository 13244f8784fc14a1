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


# The full 16-dir reference split inventory (`mono/datasets/splits/`),
# with the lists each ships (some are eval-only).
ALL_SPLIT_FILES = {
    "odometry": ["train_files.txt", "val_files.txt"],
    "raw": ["train_files.txt", "val_files.txt"],
    "3Dobject": ["train_files.txt", "val_files.txt"],
    "argo": ["train_files.txt", "val_files.txt"],
    "eigen_full": ["train_files.txt", "val_files.txt"],
    "exp": ["train_files.txt", "val_files.txt"],
    "kitti_layout": ["train_files.txt", "val_files.txt"],
    "benchmark": ["train_files.txt", "val_files.txt", "test_files.txt"],
    "eigen_benchmark": ["test_files.txt"],
    "cityscape": ["train_files.txt", "val_files.txt"],
    "kitti_shot_sequence": ["val_files.txt"],
    "nuscenes": ["train_files.txt", "val_files.txt"],
    "odom": ["train_files.txt", "val_files.txt",
             "test_files_09.txt", "test_files_10.txt"],
    "rawO": ["train_files.txt", "val_files.txt"],
    "short": ["train_files.txt", "val_files.txt"],
    "test": ["train_files.txt", "val_files.txt"],
}


def test_all_sixteen_split_dirs_shipped():
    d = default_split_dir()
    for split, names in ALL_SPLIT_FILES.items():
        for name in names:
            path = os.path.join(d, split, name)
            assert os.path.isfile(path), f"missing packaged split list {path}"
            if (split, name) == ("cityscape", "val_files.txt"):
                continue  # upstream's own val_files.txt is 0 bytes (val.txt is the real list)
            assert len(readlines(path)) > 0, f"{path} is empty"
    # companion artifacts
    assert os.path.isfile(os.path.join(d, "benchmark",
                                       "eigen_to_benchmark_ids.npy"))
    assert os.path.isfile(os.path.join(d, "kitti_archives_to_download.txt"))


def test_all_splits_match_reference_byte_for_byte():
    ref = "/root/reference/mono/datasets/splits"
    if not os.path.isdir(ref):
        import pytest

        pytest.skip("reference tree not available")
    d = default_split_dir()
    for split, names in ALL_SPLIT_FILES.items():
        for name in names:
            ours = readlines(os.path.join(d, split, name))
            theirs = readlines(os.path.join(ref, split, name))
            assert ours == theirs, f"{split}/{name} differs from reference"


def test_missing_split_fails_loudly():
    import pytest

    from jperceiver_tpu.config import Config
    from jperceiver_tpu.data.splits import get_dataset

    cfg = Config.fromdict(dict(
        type="static", split="no_such_split", in_path="/tmp",
        height=192, width=640, frame_ids=[0, -1, 1],
    ))
    with pytest.raises(FileNotFoundError, match="no_such_split"):
        get_dataset(cfg, training=True)


def test_every_family_split_resolves_or_is_known_quirk():
    """Each of the 52 family configs points at a packaged split list.

    The two `*_eigen` families keep the reference's own broken
    `split='eigen'` (upstream ships no `splits/eigen/` dir —
    `/root/reference/config/cfg_kitti_baseline_kitti_odom_4pugsB12_lr1e-4_ce_eigen.py:11`);
    they are the only allowed absences and now fail loudly at data load.
    """
    from jperceiver_tpu.config.families import _FAMILIES as FAMILIES

    d = default_split_dir()
    known_broken_upstream = {"eigen"}
    for name, spec in FAMILIES.items():
        split = spec["split"]
        if split in known_broken_upstream:
            continue
        path = os.path.join(d, split, "train_files.txt")
        assert os.path.isfile(path), (
            f"family '{name}' split '{split}' has no packaged list at {path}"
        )
