"""Geometry primitives: golden + round-trip tests."""

import numpy as np
import jax.numpy as jnp

from jperceiver_tpu.ops import (
    disp_to_depth,
    rot_from_axisangle,
    transformation_from_parameters,
    se3_matrix,
    se3_inverse,
    se3_compose,
    ground_homography,
    backproject,
    project,
    grid_sample,
)


def _np_rodrigues(vec):
    import cv2

    out = np.zeros((vec.shape[0], 4, 4), np.float64)
    for i, v in enumerate(vec):
        R, _ = cv2.Rodrigues(v.astype(np.float64))
        out[i, :3, :3] = R
        out[i, 3, 3] = 1
    return out


def test_disp_to_depth_endpoints():
    sd0, d0 = disp_to_depth(jnp.zeros(()), 0.1, 100.0)
    sd1, d1 = disp_to_depth(jnp.ones(()), 0.1, 100.0)
    assert np.isclose(d0, 100.0)
    assert np.isclose(d1, 0.1)


def test_rot_from_axisangle_matches_rodrigues(rng):
    vec = rng.standard_normal((4, 3)).astype(np.float32) * 0.3
    ours = np.asarray(rot_from_axisangle(jnp.asarray(vec)))
    ref = _np_rodrigues(vec)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_transformation_invert_consistency(rng):
    aa = rng.standard_normal((3, 3)).astype(np.float32) * 0.1
    t = rng.standard_normal((3, 3)).astype(np.float32) * 0.5
    fwd = np.asarray(transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t)))
    inv = np.asarray(
        transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t), invert=True)
    )
    prod = fwd @ inv
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5)


def test_se3_inverse_compose(rng):
    aa = rng.standard_normal((2, 3)).astype(np.float32)
    t = rng.standard_normal((2, 3)).astype(np.float32)
    R = np.asarray(rot_from_axisangle(jnp.asarray(aa)))[:, :3, :3]
    M = np.asarray(se3_matrix(jnp.asarray(R), jnp.asarray(t)))
    Minv = np.asarray(se3_inverse(jnp.asarray(M)))
    prod = np.asarray(se3_compose(jnp.asarray(M), jnp.asarray(Minv)))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5)


def test_backproject_project_roundtrip(rng):
    """Identity pose: project(backproject(depth)) is the identity grid."""
    b, h, w = 2, 6, 8
    K = np.zeros((b, 4, 4), np.float32)
    K[:, 0, 0] = 100.0
    K[:, 1, 1] = 120.0
    K[:, 0, 2] = w / 2
    K[:, 1, 2] = h / 2
    K[:, 2, 2] = 1
    K[:, 3, 3] = 1
    inv_K = np.linalg.inv(K)
    depth = rng.uniform(1.0, 10.0, size=(b, h, w, 1)).astype(np.float32)
    T = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4))

    pts = backproject(jnp.asarray(depth), jnp.asarray(inv_K))
    grid = np.asarray(project(pts, jnp.asarray(K), jnp.asarray(T), h, w))

    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    gx = xs / (w - 1) * 2 - 1
    gy = ys / (h - 1) * 2 - 1
    expect = np.broadcast_to(np.stack([gx, gy], -1), (b, h, w, 2))
    np.testing.assert_allclose(grid, expect, atol=1e-4)


def test_photometric_warp_identity(rng):
    """Warping with identity pose reproduces the source image."""
    b, h, w = 1, 8, 10
    K = np.eye(4, dtype=np.float32)[None].repeat(b, 0)
    K[:, 0, 0], K[:, 1, 1] = 50, 50
    K[:, 0, 2], K[:, 1, 2] = w / 2, h / 2
    inv_K = np.linalg.inv(K)
    depth = np.full((b, h, w, 1), 5.0, np.float32)
    img = rng.standard_normal((b, h, w, 3)).astype(np.float32)
    T = np.eye(4, dtype=np.float32)[None].repeat(b, 0)

    pts = backproject(jnp.asarray(depth), jnp.asarray(inv_K))
    grid = project(pts, jnp.asarray(K), jnp.asarray(T), h, w)
    out = np.asarray(grid_sample(jnp.asarray(img), grid, padding_mode="border"))
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_ground_homography_shape(rng):
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (2, 3, 3))
    t = np.tile(np.array([[0, 0, 1.73]], np.float32), (2, 1))
    M = np.asarray(se3_matrix(jnp.asarray(R), jnp.asarray(t)))
    K = np.broadcast_to(np.eye(3, dtype=np.float32) * 100, (2, 3, 3)).copy()
    K[:, 2, 2] = 1
    H = np.asarray(ground_homography(jnp.asarray(M), jnp.asarray(K)))
    assert H.shape == (2, 3, 3)
    # Column 0/1 are K @ r1/r2; column 2 is K @ t.
    np.testing.assert_allclose(H[:, :, 2], (K @ t[..., None])[..., 0], atol=1e-5)
