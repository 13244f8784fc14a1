"""CGT (cross-view geometric transformation) scale-label synthesis — in XLA.

Re-designs `net.py:212-476` as one pure jittable function. The reference
mixes GPU tensor ops with per-step CPU work (`.cpu()` hops, cv2 polygon
rasterization, matplotlib figure allocation); here everything is array math:

* BEV flip+rotate -> a transpose/flip permutation (no interpolation).
* Ground-plane homography -> 3x3 fp32 matmuls.
* `warp_perspective` -> the shared gather-based sampler.
* `cv2.fillConvexPoly` -> an analytic point-in-convex-quad test on a
  broadcasted iota grid (boundary raster differences vs cv2 are sub-pixel).

Dataset conventions baked into the reference (kept, with citations):
* 40 m forward x +/-20 m lateral BEV window (`net.py:269-270`).
* Camera height 1.73 m (KITTI) / 0.33 m (Argoverse) (`net.py:257-260`).
* Depth-ramp offset: KITTI static/both -0.27, Argo -1.9, KITTI dynamic 0
  (`net.py:230-233,328-330,423-426`).
* Assumption region: the rectangle x in [18,22] m lateral, y in [31,33] m
  ahead in BEV pixels (`net.py:235-238`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.geometry import ground_homography, se3_matrix
from ..ops.sampling import warp_perspective

_HIGHEST = jax.lax.Precision.HIGHEST


def _bev_to_warp_frame(x: jax.Array) -> jax.Array:
    """rotate-270 (torchvision) ONLY — the reference's fliplr is a no-op.

    `net.py:239-242` calls `torch.fliplr` on a (B, 1, S, S) tensor;
    torch.fliplr flips DIM 1, which there is the size-1 channel axis — so
    the effective transform the reference actually trains with is just
    `rotate(angle=270)` on the spatial dims. Verified against the REAL
    reference code in `tests/test_cgt_ref_golden.py` (a hand-mirrored
    fliplr+rot270 passed the quad-masked static golden by lateral symmetry
    but diverged on the full-image `both` labels).
    Exact (pure permutation, no resampling). x: (B, S, S, C) -> same.
    """
    return jnp.flip(jnp.swapaxes(x, 1, 2), axis=2)


def _distance_ramp(batch: int, size: int, offset: float, dtype=jnp.float32) -> jax.Array:
    """Row r (from top) carries depth (S - r) * 40/S - offset (`net.py:230-233`)."""
    rows = jax.lax.broadcasted_iota(dtype, (size, size), 0)
    ramp = (size - rows) * (40.0 / size) - offset
    return jnp.broadcast_to(ramp[None, :, :, None], (batch, size, size, 1))


def assumption_quad_points(occ_map_size: int):
    """The 4 assumption-region corners in rotated-BEV pixel coords.

    Pure Python replication of `net.py:235-248` (static-integer math, so it
    constant-folds); returns them in the polygon order the reference feeds
    cv2.fillConvexPoly: [p0, p2, p3, p1].
    """
    r = occ_map_size / 40.0
    pts = [
        (round(18 * r), round(31 * r)),
        (round(22 * r), round(31 * r)),
        (round(18 * r), round(33 * r)),
        (round(22 * r), round(33 * r)),
    ]
    S = occ_map_size
    rot = [
        [S - pts[3][1] - 1, pts[0][0] - 1],
        [S - pts[3][1] + (pts[2][1] - pts[1][1]) - 1, pts[0][0] - 1],
        [S - pts[3][1] - 1, pts[1][0] - 1],
        [S - pts[3][1] + (pts[2][1] - pts[1][1]) - 1, pts[1][0] - 1],
    ]
    # cv2 poly order (`net.py:296-298`): p0, p2, p3, p1.
    return [rot[0], rot[2], rot[3], rot[1]]


def _quad_mask(verts: jax.Array, height: int, width: int) -> jax.Array:
    """Inclusive point-in-convex-quad fill on the pixel grid.

    verts: (4, 2) float (x, y) in polygon order. Returns (H, W) float {0,1}.
    """
    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    crosses = []
    for i in range(4):
        x1, y1 = verts[i, 0], verts[i, 1]
        x2, y2 = verts[(i + 1) % 4, 0], verts[(i + 1) % 4, 1]
        crosses.append((x2 - x1) * (ys - y1) - (y2 - y1) * (xs - x1))
    c = jnp.stack(crosses)
    inside = jnp.all(c >= 0, axis=0) | jnp.all(c <= 0, axis=0)
    return inside.astype(jnp.float32)


def _shifted_ground_from_img(
    K3: jax.Array, Tr_cam2_velo: jax.Array, camera_height: float, occ_map_size: int
) -> jax.Array:
    """Homography: front-image pixel -> rotated-BEV pixel (`net.py:250-284`)."""
    b = K3.shape[0]
    dt = K3.dtype
    cam_T_ego = Tr_cam2_velo
    # ego <- ground: inverse of (I, [0,0,h]).
    ego_T_ground = se3_matrix(
        jnp.broadcast_to(jnp.eye(3, dtype=dt), (b, 3, 3)),
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, -camera_height], dt), (b, 3)),
    )
    cam_T_ground = jnp.matmul(cam_T_ego, ego_T_ground, precision=_HIGHEST)
    img_H_ground = ground_homography(cam_T_ground, K3)
    ground_H_img = jnp.linalg.inv(img_H_ground)

    rescale = occ_map_size / 40.0
    shift = occ_map_size // 2
    S = jnp.asarray(
        [[rescale, 0.0, 0.0], [0.0, rescale, float(shift)], [0.0, 0.0, 1.0]], dt
    )
    return jnp.matmul(jnp.broadcast_to(S, (b, 3, 3)), ground_H_img, precision=_HIGHEST)


def _transform_points(H: jax.Array, pts: jax.Array) -> jax.Array:
    """H: (3,3); pts: (N,2) -> (N,2) projective transform."""
    homo = jnp.concatenate([pts, jnp.ones((pts.shape[0], 1), pts.dtype)], axis=1)
    q = jnp.matmul(homo, H.T, precision=_HIGHEST)
    return q[:, :2] / (q[:, 2:3] + 1e-8)


def cgt_scale_label(
    bev_layout: jax.Array | None,
    K3: jax.Array,
    Tr_cam2_velo: jax.Array,
    *,
    kind: str,
    split: str,
    occ_map_size: int,
    out_hw: tuple[int, int],
) -> jax.Array:
    """Synthesize the metric-scale depth label in the front view.

    Args:
      bev_layout: (B, S, S) binary road/both mask (None for kind='dynamic').
      K3: (B, 3, 3) odometry intrinsics; Tr_cam2_velo: (B, 4, 4).
      kind: 'static' | 'dynamic' | 'both' (selects masking, `net.py:101-106`).
      split: 'argo' | 'odometry' | 'raw' (camera height & ramp offset).
      out_hw: full-resolution front-view shape the label is rasterized at.
    Returns:
      (B, H, W, 1) depth label; 0 where unsupervised.
    """
    if kind not in ("static", "dynamic", "both"):
        raise ValueError(kind)
    b = K3.shape[0]
    S = occ_map_size
    h, w = out_hw

    if split == "argo":
        camera_height, offset = 0.33, 1.9
    else:
        camera_height = 1.73
        offset = 0.0 if kind == "dynamic" else 0.27

    ramp = _bev_to_warp_frame(_distance_ramp(b, S, offset))
    H_sg_img = _shifted_ground_from_img(K3, Tr_cam2_velo, camera_height, S)
    M = jnp.linalg.inv(H_sg_img)  # the reference passes inv(H) to the warper

    dist_front = warp_perspective(ramp, M, (h, w), padding_mode="zeros")

    if kind == "dynamic":
        mask = _front_quad_mask(H_sg_img, S, h, w)
        return dist_front * mask[:, :, :, None]

    assert bev_layout is not None
    layout = _bev_to_warp_frame(bev_layout[..., None].astype(jnp.float32))
    layout_front = warp_perspective(layout, M, (h, w), padding_mode="zeros")

    if kind == "both":
        # `net.py:474-475`: plain float product, no assumption-region mask.
        return dist_front * layout_front

    # static: uint8-truncated layout AND assumption quad (`net.py:303-309`).
    layout_bin = (layout_front >= 1.0 - 1e-6).astype(jnp.float32)
    mask = _front_quad_mask(H_sg_img, S, h, w)
    return dist_front * layout_bin * mask[:, :, :, None]


def _front_quad_mask(H_sg_img: jax.Array, occ_map_size: int, h: int, w: int) -> jax.Array:
    """Assumption-region quad projected into the front view -> (B, H, W).

    The reference rasterizes from batch element 0 only and repeats
    (`net.py:294-306`); we keep that exact behaviour (calibration is constant
    within a batch).
    """
    pts = jnp.asarray(assumption_quad_points(occ_map_size), jnp.float32)
    img_pts = _transform_points(jnp.linalg.inv(H_sg_img[0]), pts)
    img_pts = jnp.round(img_pts)  # reference rounds to ints (`net.py:294-299`)
    mask = _quad_mask(img_pts, h, w)
    return jnp.broadcast_to(mask[None], (H_sg_img.shape[0], h, w))
