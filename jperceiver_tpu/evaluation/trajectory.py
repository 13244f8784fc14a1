"""Trajectory math: pose-file IO, accumulation, Umeyama alignment.

Covers the slice of the vendored evo toolkit the reference actually uses
(`mono/tools/trajectory.py:367-434`, `file_interface.py:75-382`): KITTI
pose-file IO, chaining relative poses into a global trajectory, and
Umeyama similarity alignment in its three modes (scale-only, 6-DoF, 7-DoF).
"""

from __future__ import annotations

import numpy as np


# -- pose file IO ------------------------------------------------------------

def load_kitti_poses(path: str) -> np.ndarray:
    """KITTI odometry pose file -> (N, 4, 4)."""
    rows = np.loadtxt(path).reshape(-1, 12)
    out = np.tile(np.eye(4), (rows.shape[0], 1, 1))
    out[:, :3, :4] = rows.reshape(-1, 3, 4)
    return out


def save_kitti_poses(path: str, poses: np.ndarray) -> None:
    np.savetxt(path, poses[:, :3, :4].reshape(len(poses), 12))


def accumulate_relative(rel_poses: np.ndarray) -> np.ndarray:
    """Chain per-pair transforms into a global trajectory.

    Matches `scripts/draw_odometry.py:62-77`: global_pose @= inv(T_k),
    starting from identity; returns (N+1, 4, 4).
    """
    n = len(rel_poses)
    out = np.tile(np.eye(4), (n + 1, 1, 1))
    cur = np.eye(4)
    for k, T in enumerate(rel_poses):
        cur = cur @ np.linalg.inv(T)
        out[k + 1] = cur
    return out


def positions(poses: np.ndarray) -> np.ndarray:
    return poses[:, :3, 3]


# -- Umeyama -----------------------------------------------------------------

def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform aligning x (3,N) onto y (3,N).

    Returns (R, t, c) with y ~ c*R@x + t (Umeyama 1991).
    """
    mx = x.mean(axis=1, keepdims=True)
    my = y.mean(axis=1, keepdims=True)
    xc, yc = x - mx, y - my
    n = x.shape[1]
    cov = yc @ xc.T / n
    u, d, vt = np.linalg.svd(cov)
    s = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s[2, 2] = -1
    R = u @ s @ vt
    if with_scale:
        var_x = (xc ** 2).sum() / n
        c = np.trace(np.diag(d) @ s) / var_x
    else:
        c = 1.0
    t = my[:, 0] - c * R @ mx[:, 0]
    return R, t, c


def align_trajectory(traj: np.ndarray, ref: np.ndarray,
                     correct_scale: bool = True,
                     correct_only_scale: bool = False) -> np.ndarray:
    """Align trajectory poses (N,4,4) onto ref; evo-compatible modes

    (`tools/trajectory.py:367-414`): 7-DoF (default), 6-DoF
    (correct_scale=False), scale-only (correct_only_scale=True).
    """
    x = positions(traj).T
    y = positions(ref).T
    R, t, c = umeyama_alignment(x, y, with_scale=correct_scale or correct_only_scale)
    out = traj.copy()
    if correct_only_scale:
        out[:, :3, 3] *= c
        return out
    S = np.eye(4)
    S[:3, :3] = c * R
    S[:3, 3] = t
    aligned = np.einsum("ij,njk->nik", S, out)
    # Renormalize rotation blocks (remove the scale factor).
    aligned[:, :3, :3] = np.einsum("ij,njk->nik", R, traj[:, :3, :3])
    aligned[:, 3, :] = [0, 0, 0, 1]
    return aligned


def ate_rmse(traj: np.ndarray, ref: np.ndarray) -> float:
    """Absolute trajectory error (RMSE of aligned positions)."""
    aligned = align_trajectory(traj, ref)
    d = positions(aligned) - positions(ref)
    return float(np.sqrt((d ** 2).sum(axis=1).mean()))
