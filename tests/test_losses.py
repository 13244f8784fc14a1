"""Golden tests for segmentation & photometric losses vs torch references."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from jperceiver_tpu.ops import (
    soft_iou_loss,
    soft_dice_loss,
    tversky_loss,
    focal_loss,
    weighted_cross_entropy,
    boundary_loss,
    ssim,
    robust_l1,
    reprojection_loss,
    edge_aware_smoothness,
    signed_distance_field,
)


def _torch_tp_fp_fn(probs, onehot):
    axes = (2, 3)
    tp = (probs * onehot).sum(axes)
    fp = (probs * (1 - onehot)).sum(axes)
    fn = ((1 - probs) * onehot).sum(axes)
    return tp, fp, fn


def _setup(rng, b=2, c=2, h=16, w=16):
    logits = rng.standard_normal((b, h, w, c)).astype(np.float32)
    labels = rng.integers(0, c, size=(b, h, w))
    lt = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    probs = torch.softmax(lt, 1)
    onehot = F.one_hot(torch.from_numpy(labels), c).permute(0, 3, 1, 2).float()
    return logits, labels, probs, onehot


def test_iou_dice_tversky(rng):
    logits, labels, probs, onehot = _setup(rng)
    tp, fp, fn = _torch_tp_fp_fn(probs, onehot)

    ref_iou = -((tp + 1) / (tp + fp + fn + 1)).mean().item()
    ref_dice = -((2 * tp + 1) / (2 * tp + fp + fn + 1)).mean().item()
    ref_tv = -((tp + 1) / (tp + 0.3 * fp + 0.7 * fn + 1)).mean().item()

    assert np.isclose(float(soft_iou_loss(jnp.asarray(logits), jnp.asarray(labels))), ref_iou, atol=1e-6)
    assert np.isclose(float(soft_dice_loss(jnp.asarray(logits), jnp.asarray(labels))), ref_dice, atol=1e-6)
    assert np.isclose(float(tversky_loss(jnp.asarray(logits), jnp.asarray(labels))), ref_tv, atol=1e-6)


def test_iou_perfect_prediction_is_minus_one(rng):
    labels = rng.integers(0, 2, size=(1, 8, 8))
    logits = np.zeros((1, 8, 8, 2), np.float32)
    logits[..., 0] = np.where(labels[0] == 0, 50.0, -50.0)
    logits[..., 1] = -logits[..., 0]
    val = float(soft_iou_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert np.isclose(val, -1.0, atol=1e-4)


def test_focal_loss_golden(rng):
    """Mirror of the reference focal loss math (`focal_loss.py:41-97`)."""
    logits, labels, probs, onehot = _setup(rng)
    smooth, gamma, alpha = 1e-5, 2.0, 0.25
    c = probs.shape[1]
    oh = torch.clamp(onehot, smooth / (c - 1), 1.0 - smooth)
    pt = (oh * probs).sum(1) + smooth
    logpt = pt.log()
    alpha_vec = torch.full((c,), 1 - alpha)
    alpha_vec[0] = alpha
    at = alpha_vec[torch.from_numpy(labels)]
    ref = (-at * (1 - pt) ** gamma * logpt).mean().item()
    ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert np.isclose(ours, ref, atol=1e-6)


def test_weighted_ce_matches_torch(rng):
    logits, labels, _, _ = _setup(rng)
    w = np.array([1.0, 5.0], np.float32)
    ref = F.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(labels),
        weight=torch.from_numpy(w),
    ).item()
    ours = float(
        weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w))
    )
    assert np.isclose(ours, ref, atol=1e-6)


def test_sdf_and_boundary_loss(rng):
    from scipy.ndimage import distance_transform_edt

    labels = np.zeros((12, 12), np.int64)
    labels[3:8, 4:9] = 1
    sdf = signed_distance_field(labels, 2)
    assert sdf.shape == (12, 12, 1)
    pos = labels == 1
    # Signs: negative strictly inside, positive outside, zero on inner boundary.
    assert sdf[5, 6, 0] < 0
    assert sdf[0, 0, 0] > 0
    assert sdf[3, 4, 0] == 0
    ref_out = distance_transform_edt(~pos)
    np.testing.assert_allclose(sdf[~pos, 0], ref_out[~pos], atol=1e-6)

    logits = rng.standard_normal((1, 12, 12, 2)).astype(np.float32)
    probs = torch.softmax(torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))), 1)
    ref = (probs[:, 1:] * torch.from_numpy(sdf[None].transpose(0, 3, 1, 2))).mean().item()
    ours = float(boundary_loss(jnp.asarray(logits), jnp.asarray(sdf[None])))
    assert np.isclose(ours, ref, atol=1e-6)


def _torch_ssim(x, y):
    refl = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    x, y = refl(x), refl(y)
    mu_x, mu_y = pool(x), pool(y)
    sx = pool(x ** 2) - mu_x ** 2
    sy = pool(y ** 2) - mu_y ** 2
    sxy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 0.01 ** 2) * (2 * sxy + 0.03 ** 2)
    d = (mu_x ** 2 + mu_y ** 2 + 0.01 ** 2) * (sx + sy + 0.03 ** 2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_matches_torch(rng):
    x = rng.uniform(0, 1, size=(2, 10, 12, 3)).astype(np.float32)
    y = rng.uniform(0, 1, size=(2, 10, 12, 3)).astype(np.float32)
    ref = _torch_ssim(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(np.transpose(y, (0, 3, 1, 2))),
    ).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_reprojection_loss_zero_for_identical(rng):
    x = rng.uniform(0.2, 0.8, size=(1, 8, 8, 3)).astype(np.float32)
    out = np.asarray(reprojection_loss(jnp.asarray(x), jnp.asarray(x)))
    assert out.shape == (1, 8, 8, 1)
    # SSIM term is 0, charbonnier adds only sqrt(eps^2) = 1e-3 * 0.15.
    np.testing.assert_allclose(out, 0.15 * 1e-3, atol=1e-6)


def test_smoothness_golden(rng):
    """Mirror of `net.py:758-786` in torch."""
    disp = rng.uniform(0, 1, size=(2, 8, 12, 1)).astype(np.float32)
    img = rng.uniform(0, 1, size=(2, 16, 24, 3)).astype(np.float32)

    dt = torch.from_numpy(np.transpose(disp, (0, 3, 1, 2)))
    it = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
    it = F.interpolate(it, (8, 12), mode="area")

    def grad(D):
        dy = D[:, :, 1:] - D[:, :, :-1]
        dx = D[:, :, :, 1:] - D[:, :, :, :-1]
        return dx, dy

    ddx, ddy = grad(dt)
    idx, idy = grad(it)
    ddxx, ddxy = grad(ddx)
    ddyx, ddyy = grad(ddy)
    idxx, idxy = grad(idx)
    idyx, idyy = grad(idy)

    s1 = (ddx.abs() * torch.exp(-0.5 * idx.abs().mean(1, True))).mean() + \
         (ddy.abs() * torch.exp(-0.5 * idy.abs().mean(1, True))).mean()
    s2 = (ddxx.abs() * torch.exp(-0.5 * idxx.abs().mean(1, True))).mean() + \
         (ddxy.abs() * torch.exp(-0.5 * idxy.abs().mean(1, True))).mean() + \
         (ddyx.abs() * torch.exp(-0.5 * idyx.abs().mean(1, True))).mean() + \
         (ddyy.abs() * torch.exp(-0.5 * idyy.abs().mean(1, True))).mean()
    ref = (s1 + s2).item()

    ours = float(edge_aware_smoothness(jnp.asarray(disp), jnp.asarray(img)))
    assert np.isclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_branch_gating_by_model_type():
    """Only the active branch's losses appear (root net.py:125-159)."""
    import jax
    import jax.numpy as jnp
    from jperceiver_tpu.config import Config
    from jperceiver_tpu.losses import compute_losses

    B, S = 1, 32
    base = dict(frame_ids=[0, -1, 1], scales=[0], height=64, width=64,
                occ_map_size=S, num_class=2, min_depth=0.1, max_depth=100.0,
                loss_type="iou", loss_sum=1, loss_weight=1, split="odometry",
                cgt_label_hw=(47, 78))
    outputs = {}
    k = jax.random.key(0)
    for name in ("topview", "transform_topview", "topviewB",
                 "transform_topviewB"):
        outputs[name] = jax.random.normal(jax.random.fold_in(k, hash(name) % 97),
                                          (B, S, S, 2))
    for name in ("features", "retransform_features", "featuresB",
                 "retransform_featuresB"):
        outputs[name] = jax.random.normal(jax.random.fold_in(k, hash(name) % 89),
                                          (B, 8, 8, 128))
    outputs["disp/0"] = jnp.full((B, 16, 16, 1), 0.5)
    outputs["cam_T_cam/-1"] = jnp.eye(4)[None]
    outputs["cam_T_cam/1"] = jnp.eye(4)[None]
    K = jnp.eye(4).at[0, 0].set(50.0).at[1, 1].set(50.0).at[0, 2].set(32.0).at[1, 2].set(32.0)[None]
    batch = dict(
        color=jnp.zeros((B, 3, 64, 64, 3)),
        bev_static=jnp.zeros((B, S, S), jnp.int32),
        bev_dynamic=jnp.zeros((B, S, S), jnp.int32),
        K=K, inv_K=jnp.linalg.inv(K),
        odometry_K=K, Tr_cam2_velo=jnp.eye(4)[None],
    )
    ld_static = compute_losses(outputs, batch, Config.fromdict(dict(type="static", **base)),
                               jax.random.key(1))
    assert "topview_loss" in ld_static and "topview_lossB" not in ld_static
    ld_dyn = compute_losses(outputs, batch, Config.fromdict(dict(type="dynamic", **base)),
                            jax.random.key(1))
    assert "topview_lossB" in ld_dyn and "topview_loss" not in ld_dyn


def test_automask_noise_rbg_knob():
    """`automask_noise="rbg"` (the TPU default's hardware-RNG path) is
    deterministic for a fixed key and changes ONLY the 1e-5 tie-break
    noise: every loss entry matches the threefry path to noise order."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jperceiver_tpu.config import Config
    from jperceiver_tpu.losses import compute_losses

    B, S = 1, 32
    base = dict(frame_ids=[0, -1, 1], scales=[0], height=64, width=64,
                occ_map_size=S, num_class=2, min_depth=0.1, max_depth=100.0,
                loss_type="iou", loss_sum=1, loss_weight=1, split="odometry",
                cgt_label_hw=(47, 78), type="static")
    outputs = {}
    k = jax.random.key(0)
    for name in ("topview", "transform_topview"):
        outputs[name] = jax.random.normal(
            jax.random.fold_in(k, hash(name) % 97), (B, S, S, 2))
    for name in ("features", "retransform_features"):
        outputs[name] = jax.random.normal(
            jax.random.fold_in(k, hash(name) % 89), (B, 8, 8, 128))
    outputs["disp/0"] = jnp.full((B, 16, 16, 1), 0.5)
    outputs["cam_T_cam/-1"] = jnp.eye(4)[None]
    outputs["cam_T_cam/1"] = jnp.eye(4)[None]
    K = (jnp.eye(4).at[0, 0].set(50.0).at[1, 1].set(50.0)
         .at[0, 2].set(32.0).at[1, 2].set(32.0))[None]
    batch = dict(
        color=jax.random.uniform(jax.random.fold_in(k, 7), (B, 3, 64, 64, 3)),
        bev_static=jnp.zeros((B, S, S), jnp.int32),
        K=K, inv_K=jnp.linalg.inv(K),
        odometry_K=K, Tr_cam2_velo=jnp.eye(4)[None],
    )
    cfg_rbg = Config.fromdict(dict(automask_noise="rbg", **base))
    ld1 = compute_losses(outputs, batch, cfg_rbg, jax.random.key(1))
    ld2 = compute_losses(outputs, batch, cfg_rbg, jax.random.key(1))
    lt = compute_losses(
        outputs, batch, Config.fromdict(dict(automask_noise="threefry", **base)),
        jax.random.key(1))
    for key in ld1:
        v1, v2 = float(ld1[key]), float(ld2[key])
        assert np.isfinite(v1)
        assert v1 == v2, f"{key}: rbg draw not deterministic"
        # noise is 1e-5-scale: the two generators agree to that order
        np.testing.assert_allclose(v1, float(lt[key]), atol=5e-5, rtol=1e-4)


def test_reproj_operand_bf16_auto_excludes_multibatch():
    """auto = bf16 kernel operands ONLY at batch 1 (Mosaic miscompiles the
    bf16 kernel at B>1 inside the full step — see reproj_operand_bf16)."""
    from jperceiver_tpu.config import Config
    from jperceiver_tpu.losses.multitask import reproj_operand_bf16

    auto = Config.fromdict(dict())
    assert reproj_operand_bf16(auto, True, 1) is True
    assert reproj_operand_bf16(auto, True, 2) is False
    assert reproj_operand_bf16(auto, True, 3) is False
    assert reproj_operand_bf16(auto, False, 1) is False
    forced_on = Config.fromdict(dict(pallas_reproj_bf16=True))
    assert reproj_operand_bf16(forced_on, True, 3) is True
    forced_off = Config.fromdict(dict(pallas_reproj_bf16=False))
    assert reproj_operand_bf16(forced_off, True, 1) is False
