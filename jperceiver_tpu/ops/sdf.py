"""Host-side signed distance field for the boundary loss.

The reference computes this per training step on CPU inside the loss
(`boundary_loss.py:121-147`, called from `:180`), forcing a device->host
round-trip every iteration. The SDF depends only on the ground-truth label
map, so here it lives in the input pipeline: computed once per sample in a
data-loader worker and shipped to the device alongside the labels.
"""

from __future__ import annotations

import numpy as np


def _edt(mask: np.ndarray) -> np.ndarray:
    from scipy.ndimage import distance_transform_edt

    return distance_transform_edt(mask)


def _inner_boundary(mask: np.ndarray) -> np.ndarray:
    """Pixels of `mask` with a 4- or 8-connected background neighbour.

    Equivalent to skimage.segmentation.find_boundaries(mode='inner') for a
    binary mask, without the skimage dependency.
    """
    padded = np.pad(mask, 1, mode="constant", constant_values=False)
    neigh_all_fg = np.ones_like(mask, dtype=bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = padded[1 + dy : 1 + dy + mask.shape[0], 1 + dx : 1 + dx + mask.shape[1]]
            neigh_all_fg &= shifted
    return mask & ~neigh_all_fg


def signed_distance_field(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """Per-foreground-class SDF of a label map.

    Args:
      labels: (H, W) or (B, H, W) integer label map.
      num_classes: total class count C (class 0 is background).
    Returns:
      (..., H, W, C-1) float32: negative inside the class mask, positive
      outside, zero on the inner boundary; all-zero when a class is absent —
      parity with `boundary_loss.py:121-147`.
    """
    labels = np.asarray(labels)
    if labels.ndim == 3:
        return np.stack(
            [signed_distance_field(l, num_classes) for l in labels], axis=0
        )
    h, w = labels.shape
    out = np.zeros((h, w, num_classes - 1), dtype=np.float32)
    try:
        from ..native import HAVE_NATIVE, _lib, _f32p
    except ImportError:
        HAVE_NATIVE = False
    for c in range(1, num_classes):
        pos = labels == c
        if not pos.any():
            continue
        if HAVE_NATIVE:
            import ctypes

            mask = np.ascontiguousarray(pos.astype(np.uint8))
            sdf = np.empty((h, w), np.float32)
            _lib.jp_sdf(
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                _f32p(sdf), h, w,
            )
        else:
            neg = ~pos
            sdf = _edt(neg) - _edt(pos)
            sdf[_inner_boundary(pos)] = 0.0
        out[..., c - 1] = sdf
    return out
