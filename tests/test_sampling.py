"""Golden tests: grid_sample / warp_perspective / resizes vs torch + cv2."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from jperceiver_tpu.ops import (
    grid_sample,
    warp_perspective,
    resize_area,
    resize_bilinear,
    upsample2x_nearest,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("padding", ["border", "zeros"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_matches_torch(rng, padding, align):
    img = rng.standard_normal((2, 13, 17, 3)).astype(np.float32)
    grid = (rng.uniform(-1.3, 1.3, size=(2, 9, 11, 2))).astype(np.float32)

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                  padding_mode=padding, align_corners=align))
    ref = F.grid_sample(_nchw(img), torch.from_numpy(grid),
                        mode="bilinear", padding_mode=padding,
                        align_corners=align)
    np.testing.assert_allclose(ours, _to_nhwc(ref), rtol=1e-5, atol=1e-5)


def test_grid_sample_identity(rng):
    img = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    gx = xs / 7.0 * 2 - 1
    gy = ys / 7.0 * 2 - 1
    grid = np.stack([gx, gy], -1)[None].astype(np.float32)
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_warp_perspective_identity(rng):
    img = rng.standard_normal((2, 12, 16, 1)).astype(np.float32)
    M = np.broadcast_to(np.eye(3, dtype=np.float32), (2, 3, 3))
    out = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(M), (12, 16)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_warp_perspective_matches_cv2(rng):
    import cv2

    img = rng.uniform(0, 1, size=(20, 24)).astype(np.float32)
    # A mild projective transform.
    H = np.array(
        [[1.1, 0.05, 2.0], [-0.03, 0.95, 1.0], [1e-4, -5e-5, 1.0]],
        dtype=np.float32,
    )
    ref = cv2.warpPerspective(img, H, (24, 20), flags=cv2.INTER_LINEAR,
                              borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    ours = np.asarray(
        warp_perspective(jnp.asarray(img)[None, :, :, None], jnp.asarray(H)[None],
                         (20, 24))
    )[0, :, :, 0]
    # cv2 uses fixed-point bilinear; compare loosely away from the border.
    inner = (slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(ours[inner], ref[inner], atol=2e-2)


def test_resize_area_matches_torch(rng):
    img = rng.standard_normal((2, 16, 32, 3)).astype(np.float32)
    ours = np.asarray(resize_area(jnp.asarray(img), 4, 8))
    ref = F.interpolate(_nchw(img), size=(4, 8), mode="area")
    np.testing.assert_allclose(ours, _to_nhwc(ref), rtol=1e-5, atol=1e-6)


def test_resize_bilinear_matches_torch(rng):
    img = rng.standard_normal((2, 10, 14, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), 19, 29))
    ref = F.interpolate(_nchw(img), size=(19, 29), mode="bilinear",
                        align_corners=False)
    np.testing.assert_allclose(ours, _to_nhwc(ref), rtol=1e-4, atol=1e-5)


def test_upsample2x_nearest_matches_torch(rng):
    img = rng.standard_normal((2, 5, 7, 4)).astype(np.float32)
    ours = np.asarray(upsample2x_nearest(jnp.asarray(img)))
    ref = F.interpolate(_nchw(img), scale_factor=2, mode="nearest")
    np.testing.assert_allclose(ours, _to_nhwc(ref), atol=0)


def test_grid_sample_multi_equals_stacked(rng):
    from jperceiver_tpu.ops.sampling import grid_sample_multi

    img = rng.standard_normal((2, 12, 16, 3)).astype(np.float32)
    grids = rng.uniform(-1.2, 1.2, size=(2, 4, 9, 11, 2)).astype(np.float32)
    multi = np.asarray(grid_sample_multi(jnp.asarray(img), jnp.asarray(grids)))
    for s in range(4):
        single = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grids[:, s])))
        np.testing.assert_array_equal(multi[:, s], single)


def test_grid_sample_bf16_taps_close_to_exact(rng):
    """The warp_tap_dtype=bfloat16 fast path: taps quantized to bf16 must
    stay within ~8-bit-image tolerance of the exact fp32 warp."""
    import jax.numpy as jnp

    from jperceiver_tpu.ops.sampling import grid_sample

    img = (rng.integers(0, 256, (2, 24, 32, 3)) / 255.0).astype(np.float32)
    grid = rng.uniform(-1.1, 1.1, (2, 16, 20, 2)).astype(np.float32)
    exact = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    fast = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                  tap_dtype=jnp.bfloat16))
    np.testing.assert_allclose(fast, exact, atol=5e-3)


def test_grouped_gather_path_matches_direct(rng, monkeypatch):
    """The x-grouped wide-row gather (production path at 1024^2) must be
    bit-identical to the direct small-image path."""
    import torch
    import torch.nn.functional as F

    from jperceiver_tpu.ops import sampling

    img = jnp.asarray(rng.standard_normal((2, 19, 23, 3)).astype(np.float32))
    grid = jnp.asarray(
        (rng.random((2, 9, 13, 2)) * 2.4 - 1.2).astype(np.float32))
    for mode in ("border", "zeros"):
        direct = np.asarray(sampling.grid_sample(img, grid, padding_mode=mode))
        monkeypatch.setattr(sampling, "_GROUP_MIN_ROWS", 1)
        grouped = np.asarray(sampling.grid_sample(img, grid, padding_mode=mode))
        monkeypatch.setattr(sampling, "_GROUP_MIN_ROWS", 1 << 20)
        np.testing.assert_array_equal(grouped, direct)
        ref = F.grid_sample(
            torch.from_numpy(np.asarray(img).transpose(0, 3, 1, 2)),
            torch.from_numpy(np.asarray(grid)),
            mode="bilinear", padding_mode=mode, align_corners=True,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(grouped, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding", ["border", "zeros"])
@pytest.mark.parametrize("align", [True, False])
def test_const_img_vjp_matches_autodiff(rng, padding, align):
    """img_grad=False custom VJP == plain autodiff w.r.t. the grid,
    including clamped/out-of-range coordinates and both paddings."""
    img = jnp.asarray(rng.standard_normal((2, 9, 11, 3)).astype(np.float32))
    # Grid spans well past [-1, 1] to exercise the clamp-mask tangents.
    grid = jnp.asarray(
        (rng.uniform(-1.6, 1.6, (2, 7, 8, 2))).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((2, 7, 8, 3)).astype(np.float32))

    def loss(g, img_grad):
        out = grid_sample(img, g, padding_mode=padding, align_corners=align,
                          img_grad=img_grad)
        return jnp.sum(out * cot)

    ref = jax.grad(lambda g: loss(g, True))(grid)
    got = jax.grad(lambda g: loss(g, False))(grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # forward values identical too
    f_ref = grid_sample(img, grid, padding_mode=padding, align_corners=align)
    f_got = grid_sample(img, grid, padding_mode=padding, align_corners=align,
                        img_grad=False)
    np.testing.assert_array_equal(np.asarray(f_ref), np.asarray(f_got))


def test_const_img_vjp_grouped_path(rng, monkeypatch):
    """Same check through the x8-grouped wide-row gather path."""
    import jperceiver_tpu.ops.sampling as S

    monkeypatch.setattr(S, "_GROUP_MIN_ROWS", 1)
    img = jnp.asarray(rng.standard_normal((1, 16, 24, 3)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, (1, 10, 12, 2)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((1, 10, 12, 3)).astype(np.float32))

    def loss(g, img_grad):
        return jnp.sum(grid_sample(img, g, img_grad=img_grad) * cot)

    ref = jax.grad(lambda g: loss(g, True))(grid)
    got = jax.grad(lambda g: loss(g, False))(grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_uint8_taps_exact_on_8bit_images(rng, padding, monkeypatch):
    """warp_tap_dtype=uint8: for 8-bit-exact sources (the loader's images
    are k/255) the u8 tap path is lossless up to ONE fp32 ulp — the taps
    are recovered exactly and only the dequant multiply is reassociated
    (lerp(k)·(1/255) vs lerp(k/255)) — on grouped and direct paths, and
    the const-image VJP matches plain autodiff."""
    import jperceiver_tpu.ops.sampling as S

    img = jnp.asarray((rng.integers(0, 256, (2, 14, 18, 3)) / 255.0)
                      .astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.4, 1.4, (2, 9, 12, 2))
                       .astype(np.float32))
    exact = np.asarray(grid_sample(img, grid, padding_mode=padding))
    got = np.asarray(grid_sample(img, grid, padding_mode=padding,
                                 tap_dtype=jnp.uint8))
    np.testing.assert_allclose(got, exact, rtol=0, atol=4e-7)
    monkeypatch.setattr(S, "_GROUP_MIN_ROWS", 1)
    grouped = np.asarray(grid_sample(img, grid, padding_mode=padding,
                                     tap_dtype=jnp.uint8))
    np.testing.assert_allclose(grouped, exact, rtol=0, atol=4e-7)

    cot = jnp.asarray(rng.standard_normal((2, 9, 12, 3)).astype(np.float32))

    def loss(g, img_grad):
        out = grid_sample(img, g, padding_mode=padding,
                          tap_dtype=jnp.uint8, img_grad=img_grad)
        return jnp.sum(out * cot)

    ref = jax.grad(lambda g: loss(g, True))(grid)
    got_g = jax.grad(lambda g: loss(g, False))(grid)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
