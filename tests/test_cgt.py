"""CGT scale-label golden test vs a numpy/cv2 mirror of `net.py:212-310`.

SECONDARY check — the primary parity test is `test_cgt_ref_golden.py`,
which runs the REAL reference methods. The mirror replicates the reference
pipeline step by step (rot270 — the reference's `torch.fliplr` acts on a
(B,1,S,S) tensor's dim 1 and is a no-op, see `losses/cgt.py` — SE3 chain,
H&Z homography, cv2.warpPerspective, cv2.fillConvexPoly).
"""

import cv2
import numpy as np

import jax.numpy as jnp

from jperceiver_tpu.data import kitti_like_calib
from jperceiver_tpu.losses import cgt_scale_label, assumption_quad_points


def _mirror_homography(K3, Tr, camera_height, S):
    cam_T_ego = Tr.astype(np.float64)
    ego_T_ground = np.eye(4)
    ego_T_ground[:3, 3] = [0, 0, -camera_height]
    cam_T_ground = cam_T_ego @ ego_T_ground
    img_H_ground = K3.astype(np.float64) @ np.stack(
        [cam_T_ground[:3, 0], cam_T_ground[:3, 1], cam_T_ground[:3, 3]], axis=1
    )
    ground_H_img = np.linalg.inv(img_H_ground)
    shifted = np.array([[S / 40.0, 0, 0], [0, S / 40.0, S // 2], [0, 0, 1.0]])
    return shifted @ ground_H_img


def _mirror_static(bev, K3, Tr, split, S, out_hw):
    h, w = out_hw
    offset = 1.9 if split == "argo" else 0.27
    cam_h = 0.33 if split == "argo" else 1.73
    rows = np.arange(S)[:, None].repeat(S, 1)
    ramp = (S - rows) * (40.0 / S) - offset

    bev_r = np.rot90(bev.astype(np.float32), 3)
    ramp_r = np.rot90(ramp.astype(np.float32), 3)

    H_sg_img = _mirror_homography(K3, Tr, cam_h, S)
    # reference: warp_perspective(src, inv(H_sg_img)) == sample src at H*p;
    # cv2.warpPerspective(src, M) samples src at M^-1 p, so M = inv(H_sg_img).
    M = np.linalg.inv(H_sg_img)
    layout_front = cv2.warpPerspective(bev_r, M.astype(np.float64), (w, h),
                                       flags=cv2.INTER_LINEAR)
    dist_front = cv2.warpPerspective(ramp_r, M.astype(np.float64), (w, h),
                                     flags=cv2.INTER_LINEAR)

    pts = np.asarray(assumption_quad_points(S), np.float64)
    homo = np.concatenate([pts, np.ones((4, 1))], axis=1)
    img_pts = (np.linalg.inv(H_sg_img) @ homo.T).T
    img_pts = img_pts[:, :2] / img_pts[:, 2:3]
    poly = np.round(img_pts).astype(np.int32).reshape(-1, 1, 2)
    quad = np.zeros((h, w), np.uint8)
    cv2.fillConvexPoly(quad, poly, 1)

    layout_u8 = layout_front.astype(np.uint8)  # the reference's truncation
    return dist_front * (layout_u8 & quad).astype(np.float32), quad


def test_cgt_static_matches_reference_math():
    S = 64
    K4, Tr = kitti_like_calib()
    K3 = K4[:3, :3]
    out_hw = (375, 1242)

    bev = np.zeros((S, S), np.float32)
    bev[S // 4 :, S // 3 : 2 * S // 3] = 1.0  # road ahead

    golden, quad = _mirror_static(bev, K3, Tr, "odometry", S, out_hw)

    ours = np.asarray(
        cgt_scale_label(
            jnp.asarray(bev[None]),
            jnp.asarray(K3[None]),
            jnp.asarray(Tr[None]),
            kind="static",
            split="odometry",
            occ_map_size=S,
            out_hw=out_hw,
        )
    )[0, :, :, 0]

    gm = golden > 0
    om = ours > 0
    assert gm.any(), "golden label is empty — bad test geometry"
    # Rasterization differs only at mask boundaries (cv2 line raster vs
    # analytic half-plane): demand high overlap and equal values inside.
    inter = (gm & om).sum()
    union = (gm | om).sum()
    assert inter / union > 0.95, f"mask IoU too low: {inter / union:.3f}"
    common = gm & om
    np.testing.assert_allclose(ours[common], golden[common], rtol=1e-3, atol=1e-2)
    # Values are metric depths: positive, forward-bounded by the 40 m window
    # (the ground-plane warp can stretch slightly past it at the horizon).
    assert ours[om].min() > 0
    assert ours[om].max() <= 41.0


def test_cgt_dynamic_is_quad_restricted():
    S = 64
    K4, Tr = kitti_like_calib()
    out_hw = (375, 1242)
    ours = np.asarray(
        cgt_scale_label(
            None,
            jnp.asarray(K4[:3, :3][None]),
            jnp.asarray(Tr[None]),
            kind="dynamic",
            split="odometry",
            occ_map_size=S,
            out_hw=out_hw,
        )
    )[0, :, :, 0]
    m = ours > 0
    assert m.any()
    # The assumption region is a small band near the image bottom-center.
    ys, xs = np.nonzero(m)
    assert ys.min() > 180  # below the horizon for this calibration
    frac = m.mean()
    assert frac < 0.2, f"quad mask suspiciously large: {frac:.3f}"


def test_cgt_both_uses_float_layout():
    S = 64
    K4, Tr = kitti_like_calib()
    bev = np.zeros((S, S), np.float32)
    bev[S // 4 :, S // 3 : 2 * S // 3] = 1.0
    out_hw = (375, 1242)
    ours = np.asarray(
        cgt_scale_label(
            jnp.asarray(bev[None]),
            jnp.asarray(K4[:3, :3][None]),
            jnp.asarray(Tr[None]),
            kind="both",
            split="odometry",
            occ_map_size=S,
            out_hw=out_hw,
        )
    )[0, :, :, 0]
    assert (ours > 0).any()
