"""Metrics / trajectory / odometry-eval unit tests."""

import numpy as np
import pytest

from jperceiver_tpu.evaluation import (
    compute_depth_errors,
    mean_iu,
    mean_precision,
)
from jperceiver_tpu.evaluation.trajectory import (
    accumulate_relative,
    align_trajectory,
    ate_rmse,
    load_kitti_poses,
    save_kitti_poses,
    umeyama_alignment,
)
from jperceiver_tpu.evaluation.kitti_odometry import (
    KittiOdomEval,
    average_errors,
    sequence_errors,
    trajectory_distances,
)


def test_depth_errors_perfect():
    gt = np.random.default_rng(0).uniform(1, 50, 100)
    out = compute_depth_errors(gt, gt.copy())
    abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = out
    assert abs_rel == 0 and rmse == 0 and a1 == 1


def test_mean_iu_golden():
    gt = np.zeros((4, 4), np.int64)
    gt[:2] = 1
    pred = np.zeros((4, 4), np.int64)
    pred[:1] = 1
    iou = mean_iu(pred, gt)
    # class0: inter 8 / union (8 + 12 - 8) -> 8/12; class1: 4/8.
    assert np.isclose(iou[0], 8 / 12)
    assert np.isclose(iou[1], 0.5)
    prec = mean_precision(pred, gt)
    assert np.isclose(prec[1], 1.0)  # all predicted-1 pixels are correct


def _random_trajectory(n=120, step=1.0, seed=0):
    rng = np.random.default_rng(seed)
    poses = [np.eye(4)]
    for _ in range(n - 1):
        T = np.eye(4)
        ang = rng.normal(0, 0.01)
        c, s = np.cos(ang), np.sin(ang)
        T[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
        T[2, 3] = step
        poses.append(poses[-1] @ T)
    return np.asarray(poses)


def test_umeyama_recovers_similarity():
    traj = _random_trajectory()
    x = traj[:, :3, 3].T
    R_true = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    c_true, t_true = 2.5, np.array([1.0, -2.0, 3.0])
    y = c_true * R_true @ x + t_true[:, None]
    R, t, c = umeyama_alignment(x, y)
    np.testing.assert_allclose(R, R_true, atol=1e-6)
    np.testing.assert_allclose(c, c_true, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)


def test_align_and_ate():
    traj = _random_trajectory()
    scaled = traj.copy()
    scaled[:, :3, 3] *= 0.3  # wrong scale, as monocular VO produces
    assert ate_rmse(scaled, traj) < 1e-6  # 7-DoF alignment fixes it
    only_scale = align_trajectory(scaled, traj, correct_only_scale=True)
    np.testing.assert_allclose(only_scale[:, :3, 3], traj[:, :3, 3], atol=1e-6)


def test_accumulate_relative_inverts():
    traj = _random_trajectory(n=10)
    rel = np.asarray(
        [np.linalg.inv(traj[i + 1]) @ traj[i] for i in range(9)]
    )
    rebuilt = accumulate_relative(rel)
    np.testing.assert_allclose(rebuilt, traj, atol=1e-8)


def test_sequence_errors_perfect_and_scaled(tmp_path):
    gt = _random_trajectory(n=1500)
    assert trajectory_distances(gt)[-1] > 1000
    errs = sequence_errors(gt, gt.copy())
    t_rel, r_rel = average_errors(errs)
    assert t_rel < 1e-9 and r_rel < 1e-9

    # 20% scale drift -> ~20% translation error, near-zero rotation error.
    bad = gt.copy()
    bad[:, :3, 3] *= 0.8
    t_rel, r_rel = average_errors(sequence_errors(gt, bad))
    assert 15 < t_rel < 25
    assert r_rel < 1e-6

    # Full toolkit path with scale alignment rescues it.
    gt_dir, res_dir = tmp_path / "gt", tmp_path / "res"
    gt_dir.mkdir(), res_dir.mkdir()
    save_kitti_poses(str(gt_dir / "09.txt"), gt)
    save_kitti_poses(str(res_dir / "09.txt"), bad)
    ev = KittiOdomEval(str(gt_dir), str(res_dir), align_scale=True)
    res = ev.eval_sequence("09")
    assert res["t_rel_percent"] < 0.5
    rt = load_kitti_poses(str(gt_dir / "09.txt"))
    np.testing.assert_allclose(rt, gt, atol=1e-6)
