"""Split-file handling + dataset factory.

Parity with `mono/datasets/get_dataset.py:9-42`: `cfg.data` selects the
dataset class and the split file `<split_dir>/<split>/{train,val}_files.txt`.
Like the reference, the standard split lists ship inside the package
(`data/artifacts/splits`, the default `split_dir`); `split_dir` stays
configurable and `scan_*` helpers can regenerate lists from a dataset tree.
"""

from __future__ import annotations

import os
from typing import Sequence

ARTIFACTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "artifacts")


def default_split_dir() -> str | None:
    """The packaged split lists (parity with the reference shipping its
    lists in-repo, `mono/datasets/splits/`); None if absent."""
    d = os.path.join(ARTIFACTS_DIR, "splits")
    return d if os.path.isdir(d) else None


def default_gt_pose_dir() -> str | None:
    """Packaged KITTI odometry GT poses (reference `mono/datasets/gt_pose/`)."""
    d = os.path.join(ARTIFACTS_DIR, "gt_pose")
    return d if os.path.isdir(d) else None


def readlines(path: str) -> list[str]:
    with open(path) as f:
        return [l.strip() for l in f if l.strip()]


def split_file(split_dir: str, split: str, training: bool) -> str:
    if training:
        return os.path.join(split_dir, split, "train_files.txt")
    # Eval: benchmark-style splits (eigen_benchmark, test) ship only
    # test_files.txt — the reference's offline eval scripts read those
    # directly (`splits/eigen_benchmark/test_files.txt`); fall back to it
    # when the split has no val list.
    val = os.path.join(split_dir, split, "val_files.txt")
    if os.path.isfile(val):
        return val
    test = os.path.join(split_dir, split, "test_files.txt")
    return test if os.path.isfile(test) else val


def scan_odometry_split(data_path: str, sequences: Sequence[str]) -> list[str]:
    """Regenerate odometry split lines (`<seq>/road_dense128/<frame>.png`)."""
    out = []
    for seq in sequences:
        d = os.path.join(data_path, seq, "road_dense128")
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if f.endswith(".png"):
                out.append(f"{seq}/road_dense128/{f}")
    return out


def scan_object_split(data_path: str) -> list[str]:
    d = os.path.join(data_path, "training", "vehicle_256")
    if not os.path.isdir(d):
        return []
    return [os.path.splitext(f)[0] for f in sorted(os.listdir(d)) if f.endswith(".png")]


def get_dataset(data_cfg, training: bool = True, with_sdf: bool = False,
                num_class: int = 2):
    """cfg.data -> dataset instance (parity with `get_dataset.py:9-42`)."""
    from .argoverse import Argoverse
    from .kitti import KittiDepth, KittiObject, KittiOdometry, KittiRaw

    dtype = data_cfg.get("type", "static")
    name = data_cfg.get("name", "")

    # Aux datasets dispatch by `name` like the reference factory
    # (`get_dataset.py:10-29`); euroc/eth3d/folder scan a directory tree,
    # cityscape/nuscenes consume split files.
    if name == "simulated":
        # Self-contained rendered scenes with analytic GT (data/simulated.py)
        # — the acceptance-run dataset; no files on disk required.
        from .simulated import SimulatedDataset

        return SimulatedDataset(
            n_scenes=data_cfg.get("n_scenes", 64),
            height=data_cfg["height"], width=data_cfg["width"],
            seed=data_cfg.get("seed", 0 if training else 7),
            with_gt=data_cfg.get("with_gt", not training),
            model_type=dtype,
            split=data_cfg.get("split", "odometry"),
        )

    if name in ("euroc", "eth3d", "folder"):
        from .aux_datasets import Eth3dDataset, EurocDataset
        from .folder import FolderDataset

        cls = {"euroc": EurocDataset, "eth3d": Eth3dDataset}.get(name)
        if cls is None:
            return FolderDataset(
                data_cfg["in_path"], data_cfg["height"], data_cfg["width"],
                intrinsics=data_cfg.get("intrinsics", "kitti"),
            )
        return cls(
            data_cfg["in_path"], data_cfg["height"], data_cfg["width"],
            frame_ids=tuple(data_cfg.get("frame_ids", (0, -1, 1))),
            is_train=training,
        )

    split_dir = data_cfg.get("split_dir") or default_split_dir()
    if split_dir is None:
        raise ValueError(
            "data.split_dir must point at a splits directory "
            "(the packaged data/artifacts/splits is missing)"
        )
    sfile = split_file(split_dir, data_cfg["split"], training)
    if not os.path.isfile(sfile):
        have = sorted(
            d for d in os.listdir(split_dir)
            if os.path.isdir(os.path.join(split_dir, d))
        ) if os.path.isdir(split_dir) else []
        raise FileNotFoundError(
            f"split '{data_cfg['split']}' has no "
            f"{'train' if training else 'val'} list at {sfile}; "
            f"available splits under {split_dir}: {have}"
        )
    filenames = readlines(sfile)

    if name == "cityscape":
        from .aux_datasets import CityscapesDataset

        return CityscapesDataset(
            data_cfg["in_path"], filenames, data_cfg["height"],
            data_cfg["width"],
            frame_ids=tuple(data_cfg.get("frame_ids", (0, -1, 1))),
            is_train=training,
            img_ext=".png" if data_cfg.get("png", True) else ".jpg",
        )

    common = dict(
        data_path=data_cfg["in_path"],
        filenames=filenames,
        height=data_cfg["height"],
        width=data_cfg["width"],
        frame_ids=tuple(data_cfg.get("frame_ids", (0, -1, 1))),
        is_train=training,
        with_sdf=with_sdf,
        num_class=num_class,
    )
    if name == "nuscenes":
        from .aux_datasets import NuscenesDataset

        return NuscenesDataset(
            seg_class=data_cfg.get("seg_class", "vehicle"), **common)
    if dtype == "static":
        return KittiOdometry(
            raw_calib_root=data_cfg.get("raw_calib_root"), **common
        )
    if dtype == "static_raw":
        cls = KittiDepth if data_cfg.get("name") == "kitti_depth" else KittiRaw
        return cls(**common)
    if dtype == "dynamic":
        return KittiObject(**common)
    if dtype.startswith("Argo"):
        return Argoverse(type=dtype, **common)
    raise ValueError(f"unknown data type {dtype}")
