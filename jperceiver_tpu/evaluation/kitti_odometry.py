"""KITTI odometry benchmark evaluation (t_rel %, r_rel deg/m).

Re-implementation of the official devkit protocol used by the reference's
`mono/tools/kitti_evaluation_toolkit.py:147-201,554-640`:

* per-frame cumulative path length,
* for every frame and every segment length in {100..800} m, the relative
  pose error  E = inv(gt_i^-1 gt_j) (pred_i^-1 pred_j),
* translation error = |t(E)| / len, rotation error = angle(E) / len,
* averaged over all valid segments; optional Umeyama scale pre-alignment
  (the reference aligns with `correct_only_scale=True`, `:569-574`).
"""

from __future__ import annotations

import os

import numpy as np

from .trajectory import align_trajectory, load_kitti_poses

SEGMENT_LENGTHS = (100, 200, 300, 400, 500, 600, 700, 800)


def trajectory_distances(poses: np.ndarray) -> np.ndarray:
    """Cumulative path length per frame."""
    steps = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1)
    return np.concatenate([[0.0], np.cumsum(steps)])


def _last_frame_from_len(dist: np.ndarray, first: int, seg_len: float) -> int:
    target = dist[first] + seg_len
    idx = np.searchsorted(dist, target)
    return int(idx) if idx < len(dist) else -1


def rotation_error(E: np.ndarray) -> float:
    a = 0.5 * (np.trace(E[:3, :3]) - 1.0)
    return float(np.arccos(np.clip(a, -1.0, 1.0)))


def translation_error(E: np.ndarray) -> float:
    return float(np.linalg.norm(E[:3, 3]))


def sequence_errors(gt: np.ndarray, pred: np.ndarray, step: int = 10):
    """[(first, r_err/len, t_err/len, seg_len), ...] over all segments."""
    dist = trajectory_distances(gt)
    errors = []
    for first in range(0, len(gt), step):
        for seg_len in SEGMENT_LENGTHS:
            last = _last_frame_from_len(dist, first, seg_len)
            if last < 0 or last >= len(pred):
                continue
            gt_rel = np.linalg.inv(gt[first]) @ gt[last]
            pr_rel = np.linalg.inv(pred[first]) @ pred[last]
            E = np.linalg.inv(gt_rel) @ pr_rel
            errors.append(
                (first, rotation_error(E) / seg_len,
                 translation_error(E) / seg_len, seg_len)
            )
    return errors


def average_errors(errors) -> tuple[float, float]:
    """(t_rel %, r_rel deg/100m) — the two headline numbers."""
    if not errors:
        return float("nan"), float("nan")
    r = np.mean([e[1] for e in errors])
    t = np.mean([e[2] for e in errors])
    return float(t * 100.0), float(np.degrees(r) * 100.0)


class KittiOdomEval:
    """Evaluate predicted KITTI pose files against ground truth.

    Parity with `kittiOdomEval.eval` (`kitti_evaluation_toolkit.py:554-640`):
    scale-only Umeyama alignment, per-segment errors, optional plots.
    """

    def __init__(self, gt_dir: str, result_dir: str, align_scale: bool = True):
        self.gt_dir = gt_dir
        self.result_dir = result_dir
        self.align_scale = align_scale

    def eval_sequence(self, seq: str) -> dict:
        gt = load_kitti_poses(os.path.join(self.gt_dir, f"{seq}.txt"))
        pred = load_kitti_poses(os.path.join(self.result_dir, f"{seq}.txt"))
        n = min(len(gt), len(pred))
        gt, pred = gt[:n], pred[:n]
        if self.align_scale:
            pred = align_trajectory(pred, gt, correct_only_scale=True)
        errs = sequence_errors(gt, pred)
        t_rel, r_rel = average_errors(errs)
        return {"seq": seq, "t_rel_percent": t_rel, "r_rel_deg_per_100m": r_rel,
                "n_frames": n, "n_segments": len(errs)}

    def plot_trajectory(self, seq: str, out_path: str) -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        gt = load_kitti_poses(os.path.join(self.gt_dir, f"{seq}.txt"))
        pred = load_kitti_poses(os.path.join(self.result_dir, f"{seq}.txt"))
        if self.align_scale:
            pred = align_trajectory(pred[: len(gt)], gt[: len(pred)],
                                    correct_only_scale=True)
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.plot(gt[:, 0, 3], gt[:, 2, 3], "k-", label="GT")
        ax.plot(pred[:, 0, 3], pred[:, 2, 3], "b-", label="Ours")
        ax.set_xlabel("x [m]")
        ax.set_ylabel("z [m]")
        ax.legend()
        ax.set_title(f"KITTI {seq}")
        ax.axis("equal")
        fig.savefig(out_path, dpi=100, bbox_inches="tight")
        plt.close(fig)
