"""Odometry toolkit completeness: speed/segment curves, plots, pose IO.

The aggregation functions are golden-tested against the REAL reference
toolkit (`mono/tools/kitti_evaluation_toolkit.py`) on a synthetic
trajectory; pose IO round-trips through all three formats.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from jperceiver_tpu.evaluation.kitti_odometry import (
    KittiOdomEval,
    average_errors,
    segment_error_curve,
    sequence_errors,
    speed_error_curve,
    to_camera_coord,
)
from jperceiver_tpu.evaluation.trajectory import (
    load_euroc_csv,
    load_kitti_poses,
    load_kitti_poses_indexed,
    load_tum_trajectory,
    save_kitti_poses,
    save_tum_trajectory,
)
from jperceiver_tpu.evaluation.transforms import (
    euler_from_matrix_axes,
    euler_matrix_axes,
    quaternion_from_matrix,
)


def _synthetic_trajectory(n=900, step=1.2, drift=0.0005):
    """A gently curving forward drive (~10 Hz KITTI style) + drifted copy."""
    gt = np.tile(np.eye(4), (n, 1, 1))
    pred = np.tile(np.eye(4), (n, 1, 1))
    pos = np.zeros(3)
    pos_p = np.zeros(3)
    yaw = 0.0
    for i in range(1, n):
        yaw += 0.001
        d = np.array([np.sin(yaw), 0.0, np.cos(yaw)]) * step
        pos = pos + d
        pos_p = pos_p + d * (1 + drift * i) + np.array([drift * i, 0, 0])
        for arr, p in ((gt, pos), (pred, pos_p)):
            arr[i, :3, :3] = np.array(
                [[np.cos(yaw), 0, np.sin(yaw)],
                 [0, 1, 0],
                 [-np.sin(yaw), 0, np.cos(yaw)]])
        gt[i, :3, 3] = pos
        pred[i, :3, 3] = pos_p
    return gt, pred


@pytest.fixture(scope="module")
def ref_toolkit():
    """Load the reference kittiOdomEval class without running its CLI."""
    sys.modules.setdefault("mono", types.ModuleType("mono"))
    tools_pkg = types.ModuleType("mono.tools")
    tools_pkg.__path__ = ["/root/reference/mono/tools"]
    sys.modules["mono.tools"] = tools_pkg
    spec = importlib.util.spec_from_file_location(
        "ref_kitti_eval", "/root/reference/mono/tools/kitti_evaluation_toolkit.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    inst = mod.kittiOdomEval.__new__(mod.kittiOdomEval)
    inst.lengths = [100, 200, 300, 400, 500, 600, 700, 800]
    inst.num_lengths = 8
    return inst


def test_sequence_errors_match_reference(ref_toolkit):
    gt, pred = _synthetic_trajectory()
    ref_errs = ref_toolkit.calcSequenceErrors(
        {i: p for i, p in enumerate(gt)}, {i: p for i, p in enumerate(pred)})
    # NOTE the reference computes E = inv(pred_rel) @ gt_rel; ours is its
    # inverse — identical rotation angle and translation norm.
    ours = sequence_errors(gt, pred)
    assert len(ours) == len(ref_errs)
    for o, r in zip(ours, ref_errs):
        assert o[0] == r[0]
        np.testing.assert_allclose(o[1], r[1], rtol=1e-9)  # r_err/len
        np.testing.assert_allclose(o[2], r[2], rtol=1e-9)  # t_err/len
        assert o[3] == r[3]
        np.testing.assert_allclose(o[4], r[4], rtol=1e-12)  # speed

    ref_seg = ref_toolkit.computeSegmentErr(ref_errs)
    seg = segment_error_curve(ours)
    for k in seg:
        if seg[k]:
            np.testing.assert_allclose(seg[k], ref_seg[k], rtol=1e-9)
        else:
            assert ref_seg[k] == []

    ref_speed = ref_toolkit.computeSpeedErr(ref_errs)
    spd = speed_error_curve(ours)
    for k in spd:
        if spd[k]:
            np.testing.assert_allclose(spd[k], ref_speed[k], rtol=1e-9)
        else:
            assert ref_speed[k] == []

    ref_t, ref_r = ref_toolkit.computeOverallErr(ref_errs)
    t_rel, r_rel = average_errors(ours)
    np.testing.assert_allclose(t_rel, ref_t * 100, rtol=1e-9)
    np.testing.assert_allclose(r_rel, np.degrees(ref_r) * 100, rtol=1e-9)


def test_to_camera_coord_matches_reference(ref_toolkit, rng):
    from jperceiver_tpu.evaluation.transforms import se3_exp

    P = se3_exp(rng.standard_normal(3) * 0.3, rng.standard_normal(3))
    np.testing.assert_allclose(
        to_camera_coord(P), ref_toolkit.toCameraCoord(P), atol=1e-12)


def test_eval_writes_stats_and_plots(tmp_path):
    gt, pred = _synthetic_trajectory(n=600)
    gt_dir, res_dir = tmp_path / "gt", tmp_path / "res"
    gt_dir.mkdir(), res_dir.mkdir()
    save_kitti_poses(str(gt_dir / "09.txt"), gt)
    save_kitti_poses(str(res_dir / "09.txt"), pred)

    ev = KittiOdomEval(str(gt_dir), str(res_dir))
    results = ev.eval(["09"], plot=True)
    r = results["09"]
    assert np.isfinite(r["t_rel_percent"]) and np.isfinite(r["r_rel_deg_per_100m"])
    assert r["max_speed_ms"] > 0 and r["distance_m"] > 500
    assert any(v for v in r["segment_errors"].values())
    assert any(v for v in r["speed_errors"].values())
    out = tmp_path / "res" / "09_eval"
    for f in ("09_error.txt", "09_stats.txt", "09_path2d.png", "09_path3d.png",
              "09_xyz.png", "09_rpy.png", "09_err_seg.png", "09_err_speed.png"):
        assert (out / f).exists(), f
        assert (out / f).stat().st_size > 0, f


def test_kitti_indexed_pose_loading(tmp_path):
    gt, _ = _synthetic_trajectory(n=5)
    p12 = tmp_path / "plain.txt"
    save_kitti_poses(str(p12), gt)
    plain = load_kitti_poses_indexed(str(p12))
    np.testing.assert_allclose(plain[3], gt[3], atol=1e-9)

    p13 = tmp_path / "indexed.txt"
    with open(p13, "w") as f:
        for i, pose in enumerate(gt):
            f.write(f"{i * 2} " + " ".join(map(str, pose[:3].ravel())) + "\n")
    idxd = load_kitti_poses_indexed(str(p13))
    assert set(idxd) == {0, 2, 4, 6, 8}
    np.testing.assert_allclose(idxd[6], gt[3], atol=1e-9)


def test_tum_round_trip(tmp_path, rng):
    from jperceiver_tpu.evaluation.transforms import se3_exp

    poses = np.stack([se3_exp(rng.standard_normal(3) * 0.4,
                              rng.standard_normal(3)) for _ in range(7)])
    stamps = np.arange(7) * 0.1 + 5.0
    path = str(tmp_path / "traj.tum")
    save_tum_trajectory(path, poses, stamps)
    s2, p2 = load_tum_trajectory(path)
    np.testing.assert_allclose(s2, stamps, atol=1e-9)
    np.testing.assert_allclose(p2, poses, atol=1e-9)


def test_euroc_csv_loading(tmp_path, rng):
    from jperceiver_tpu.evaluation.transforms import se3_exp

    poses = np.stack([se3_exp(rng.standard_normal(3) * 0.4,
                              rng.standard_normal(3)) for _ in range(4)])
    path = str(tmp_path / "data.csv")
    with open(path, "w") as f:
        f.write("#timestamp, p_x, p_y, p_z, q_w, q_x, q_y, q_z, ...\n")
        for i, p in enumerate(poses):
            q = quaternion_from_matrix(p)
            vals = ([str(int(1e9 * (i + 1)))] + [f"{v:.9f}" for v in p[:3, 3]]
                    + [f"{v:.9f}" for v in q] + ["0"] * 9)
            f.write(",".join(vals) + "\n")
    stamps, loaded = load_euroc_csv(path)
    np.testing.assert_allclose(stamps, np.arange(1, 5, dtype=float), atol=1e-9)
    np.testing.assert_allclose(loaded, poses, atol=1e-6)


def test_euler_axes_round_trip(rng):
    for axes in ("sxyz", "szxy", "rzyx", "szyz", "rxyx"):
        for _ in range(5):
            angles = rng.uniform(-1.2, 1.2, 3)
            M = euler_matrix_axes(*angles, axes)
            back = euler_from_matrix_axes(M, axes)
            M2 = euler_matrix_axes(*back, axes)
            np.testing.assert_allclose(M2, M, atol=1e-10, err_msg=axes)
