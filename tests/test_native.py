"""Native host-ops library vs scipy/numpy fallbacks.

Skipped when `native/libjperceiver_host.so` hasn't been built
(`make -C native`).
"""

import numpy as np
import pytest

from jperceiver_tpu import native

pytestmark = pytest.mark.skipif(
    not native.HAVE_NATIVE, reason="native library not built"
)


def test_sdf_matches_scipy(rng):
    from scipy.ndimage import distance_transform_edt

    mask = np.zeros((64, 64), np.uint8)
    mask[10:40, 20:55] = 1
    mask[20:25, 30:35] = 0  # a hole
    out = native.sdf_mask(mask)

    pos = mask.astype(bool)
    ref = distance_transform_edt(~pos) - distance_transform_edt(pos)
    pad = np.pad(pos, 1)
    interior = np.ones_like(pos)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            interior &= pad[1 + dy : 65 + dy, 1 + dx : 65 + dx]
    ref[pos & ~interior] = 0
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_sdf_empty_mask():
    out = native.sdf_mask(np.zeros((16, 16), np.uint8))
    np.testing.assert_array_equal(out, 0)


def test_resize_matches_fallback(rng):
    img = rng.uniform(0, 1, (37, 53, 3)).astype(np.float32)
    a = native.resize_bilinear(img, 64, 96)
    lib = native._lib
    try:
        native._lib = None
        b = native.resize_bilinear(img, 64, 96)
    finally:
        native._lib = lib
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_velo_project_matches_fallback(rng):
    pts = np.zeros((5000, 4), np.float32)
    pts[:, 0] = rng.uniform(1, 60, 5000)
    pts[:, 1] = rng.uniform(-15, 15, 5000)
    pts[:, 2] = rng.uniform(-2, 2, 5000)
    K = np.array([[700, 0, 600], [0, 700, 180], [0, 0, 1]], np.float64)
    T = np.array([[0, -1, 0, 0], [0, 0, -1, -0.08], [1, 0, 0, -0.27]], np.float64)
    P = K @ T
    a = native.velo_project(pts, P, 375, 1242)
    lib = native._lib
    try:
        native._lib = None
        b = native.velo_project(pts, P, 375, 1242)
    finally:
        native._lib = lib
    np.testing.assert_array_equal(a, b)
    assert (a > 0).sum() > 1000


def test_pipeline_sdf_uses_native():
    """ops.sdf routes through the native kernel and stays scipy-exact."""
    from jperceiver_tpu.ops.sdf import signed_distance_field
    from scipy.ndimage import distance_transform_edt

    labels = np.zeros((32, 32), np.int64)
    labels[8:20, 8:24] = 1
    out = signed_distance_field(labels, 2)[..., 0]
    pos = labels == 1
    outside = distance_transform_edt(~pos)
    np.testing.assert_allclose(out[~pos], outside[~pos], atol=1e-4)
