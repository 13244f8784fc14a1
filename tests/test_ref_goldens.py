"""Goldens vs the REAL reference modules (not builder mirrors).

Every test here imports the actual code under /root/reference/mono/model/
mono_baseline via tests/ref_torch.py and compares our JAX ops against it on
the same random inputs — addressing VERDICT round 1 ("mirror-based goldens").
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ref_torch import load_ref


@pytest.fixture(autouse=True)
def _cpu_cuda(monkeypatch):
    """Reference layers call .cuda() unconditionally (`layers.py:58-60`)."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False)


def _softmax_ch1(x):
    return F.softmax(x, 1)


def _rand_logits_labels(rng, b=2, h=16, w=16, c=2):
    logits = rng.standard_normal((b, c, h, w)).astype(np.float32)
    labels = rng.integers(0, c, (b, h, w)).astype(np.int64)
    return logits, labels


def _ours(logits_nchw):
    return jnp.asarray(np.transpose(logits_nchw, (0, 2, 3, 1)))


# ---------------------------------------------------------------------------
# dice_loss.py
# ---------------------------------------------------------------------------

def test_iou_dice_tversky_vs_reference(rng):
    dl = load_ref("dice_loss")
    from jperceiver_tpu.ops import soft_dice_loss, soft_iou_loss, tversky_loss

    logits, labels = _rand_logits_labels(rng)
    lt, yt = torch.from_numpy(logits), torch.from_numpy(labels)

    for ref_cls, ours in (
        (dl.IoULoss, soft_iou_loss),
        (dl.SoftDiceLoss, soft_dice_loss),
        (dl.TverskyLoss, tversky_loss),
    ):
        ref = ref_cls(apply_nonlin=_softmax_ch1)(lt, yt).item()
        got = float(ours(_ours(logits), jnp.asarray(labels)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, err_msg=ref_cls.__name__)


def test_gdice_vs_reference(rng):
    dl = load_ref("dice_loss")
    from jperceiver_tpu.ops.seg_losses import generalized_dice_loss

    logits, labels = _rand_logits_labels(rng)
    # GDiceLoss's einsums are written for 5-D volumes ("bcxyz",
    # `dice_loss.py:121-123`) — feed it a z=1 volume.
    lt = torch.from_numpy(logits)[..., None]
    yt = torch.from_numpy(labels)[:, None, :, :, None]
    ref = dl.GDiceLoss(apply_nonlin=_softmax_ch1)(lt, yt).item()
    got = float(generalized_dice_loss(_ours(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_ss_asym_vs_reference(rng):
    dl = load_ref("dice_loss")
    from jperceiver_tpu.ops.seg_losses import asym_loss, ss_loss

    logits, labels = _rand_logits_labels(rng)
    lt, yt = torch.from_numpy(logits), torch.from_numpy(labels)

    ref = dl.SSLoss(apply_nonlin=_softmax_ch1)(lt, yt).item()
    got = float(ss_loss(_ours(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    ref = dl.AsymLoss(apply_nonlin=_softmax_ch1)(lt, yt).item()
    got = float(asym_loss(_ours(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


# ---------------------------------------------------------------------------
# focal_loss.py
# ---------------------------------------------------------------------------

def test_focal_vs_reference(rng):
    fl = load_ref("focal_loss")
    from jperceiver_tpu.ops import focal_loss

    logits, labels = _rand_logits_labels(rng)
    ref = fl.FocalLoss(apply_nonlin=_softmax_ch1)(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    got = float(focal_loss(_ours(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


# ---------------------------------------------------------------------------
# boundary_loss.py
# ---------------------------------------------------------------------------

def _blob_labels(rng, b=2, h=24, w=24):
    labels = np.zeros((b, h, w), np.int64)
    for i in range(b):
        y0, x0 = rng.integers(2, h // 2, 2)
        labels[i, y0 : y0 + h // 3, x0 : x0 + w // 3] = 1
    return labels


def test_bdloss_vs_reference(rng):
    bl = load_ref("boundary_loss")
    from jperceiver_tpu.ops import boundary_loss
    from jperceiver_tpu.ops.sdf import signed_distance_field

    b, h, w, c = 2, 24, 24, 2
    logits = rng.standard_normal((b, c, h, w)).astype(np.float32)
    labels = _blob_labels(rng, b, h, w)

    ref = bl.BDLoss()(torch.from_numpy(logits), torch.from_numpy(labels)).item()
    sdf = signed_distance_field(labels, c)
    got = float(boundary_loss(_ours(logits), jnp.asarray(sdf)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_hdloss_vs_reference(rng):
    bl = load_ref("boundary_loss")
    from jperceiver_tpu.ops.seg_losses import hausdorff_loss

    b, h, w, c = 2, 24, 24, 2
    logits = rng.standard_normal((b, c, h, w)).astype(np.float32)
    labels = _blob_labels(rng, b, h, w)

    ref = bl.HDLoss()(torch.from_numpy(logits), torch.from_numpy(labels)).item()
    got = float(hausdorff_loss(_ours(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_edt_sq_matches_scipy(rng):
    from scipy.ndimage import distance_transform_edt

    from jperceiver_tpu.ops.seg_losses import _edt_sq

    mask = rng.uniform(size=(3, 20, 28)) > 0.6
    mask[:, 0, :] = False  # guarantee some background
    got = np.asarray(_edt_sq(jnp.asarray(mask)))
    for i in range(3):
        expected = distance_transform_edt(mask[i]) ** 2
        np.testing.assert_allclose(got[i], expected, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# layers.py: SSIM / Backproject / Project / disp_to_depth
# ---------------------------------------------------------------------------

def test_ssim_vs_reference(rng):
    layers = load_ref("layers")
    from jperceiver_tpu.ops import ssim

    x = rng.uniform(0, 1, (2, 3, 16, 20)).astype(np.float32)
    y = rng.uniform(0, 1, (2, 3, 16, 20)).astype(np.float32)
    ref = layers.SSIM()(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    got = np.asarray(ssim(_ours(x), _ours(y)))
    np.testing.assert_allclose(got, ref.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_backproject_project_vs_reference(rng):
    layers = load_ref("layers")
    from jperceiver_tpu.ops import backproject, project

    b, h, w = 2, 12, 16
    depth = rng.uniform(1, 50, (b, 1, h, w)).astype(np.float32)
    K = np.tile(np.array(
        [[0.58 * w, 0, 0.5 * w, 0],
         [0, 1.92 * h, 0.5 * h, 0],
         [0, 0, 1, 0],
         [0, 0, 0, 1]], np.float32), (b, 1, 1))
    inv_K = np.linalg.pinv(K).astype(np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    T[:, 0, 3] = rng.uniform(-0.5, 0.5, b)
    T[:, 2, 3] = rng.uniform(-0.5, 0.5, b)

    with torch.no_grad():
        bp = layers.Backproject(b, h, w)
        pts_ref = bp(torch.from_numpy(depth), torch.from_numpy(inv_K))
        pr = layers.Project(b, h, w)
        pix_ref = pr(pts_ref, torch.from_numpy(K), torch.from_numpy(T)).numpy()

    depth_nhwc = jnp.asarray(depth.transpose(0, 2, 3, 1))
    pts = backproject(depth_nhwc, jnp.asarray(inv_K))
    pix = project(pts, jnp.asarray(K), jnp.asarray(T), h, w)
    np.testing.assert_allclose(np.asarray(pix), pix_ref, rtol=1e-4, atol=1e-5)


def test_disp_to_depth_vs_reference(rng):
    layers = load_ref("layers")
    from jperceiver_tpu.ops import disp_to_depth

    disp = rng.uniform(0, 1, (2, 8, 8, 1)).astype(np.float32)
    sd_ref, d_ref = layers.disp_to_depth(torch.from_numpy(disp), 0.1, 100.0)
    sd, d = disp_to_depth(jnp.asarray(disp), 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(sd), sd_ref.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d), d_ref.numpy(), rtol=1e-5)
