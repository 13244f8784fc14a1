"""Synthetic batches with realistic calibration — for tests, bench, dry runs."""

from __future__ import annotations

import numpy as np


def kitti_like_calib():
    """Plausible KITTI odometry calibration.

    K from sequence-00-style intrinsics; Tr_cam2_velo with the canonical
    velodyne->camera axis permutation (x_c=-y_v, y_c=-z_v, z_c=x_v).
    """
    K = np.array(
        [
            [707.09, 0.0, 601.89, 0.0],
            [0.0, 707.09, 183.11, 0.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        np.float32,
    )
    Tr = np.array(
        [
            [0.0, -1.0, 0.0, -0.01],
            [0.0, 0.0, -1.0, -0.075],
            [1.0, 0.0, 0.0, -0.27],
            [0.0, 0.0, 0.0, 1.0],
        ],
        np.float32,
    )
    return K, Tr


def synthetic_batch(
    batch: int = 2,
    height: int = 64,
    width: int = 64,
    occ_map_size: int = 16,
    num_frames: int = 3,
    seed: int = 0,
    dtype=np.float32,
):
    """A full training batch matching the model's input schema."""
    rng = np.random.default_rng(seed)
    K_full, Tr = kitti_like_calib()

    # Normalized-K convention of the KITTI loaders (`mono_dataset.py:101-116`):
    # scale the unit intrinsics by the input resolution.
    K = np.array(
        [
            [0.58 * width, 0, 0.5 * width, 0],
            [0, 1.92 * height, 0.5 * height, 0],
            [0, 0, 1, 0],
            [0, 0, 0, 1],
        ],
        dtype,
    )
    inv_K = np.linalg.pinv(K).astype(dtype)

    color = rng.uniform(0, 1, (batch, num_frames, height, width, 3)).astype(dtype)

    s = occ_map_size
    bev = np.zeros((batch, s, s), np.int32)
    bev[:, s // 4 : s - 2, s // 3 : 2 * s // 3] = 1  # a road-ish blob
    bev_d = np.zeros((batch, s, s), np.int32)
    bev_d[:, s // 2 : s // 2 + 3, s // 2 : s // 2 + 2] = 1

    from ..ops.sdf import signed_distance_field

    return {
        "color": color,
        "color_aug": np.clip(color + rng.normal(0, 0.02, color.shape).astype(dtype), 0, 1),
        "K": np.tile(K[None], (batch, 1, 1)),
        "inv_K": np.tile(inv_K[None], (batch, 1, 1)),
        "odometry_K": np.tile(K_full[None], (batch, 1, 1)),
        "Tr_cam2_velo": np.tile(Tr[None], (batch, 1, 1)),
        "bev_static": bev,
        "bev_dynamic": bev_d,
        "bev_both": bev.astype(dtype),
        "bev_static_sdf": signed_distance_field(bev, 2).astype(dtype),
        "bev_dynamic_sdf": signed_distance_field(bev_d, 2).astype(dtype),
    }
