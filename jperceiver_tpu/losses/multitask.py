"""The full multi-task training objective as one pure function.

Parity target: `Baseline.compute_losses` (`net.py:94-192`) plus the
`batch_processor` summation quirk (`trainer.py:35-46`) — the reference sums
*every* loss-dict entry including the composite `layout_loss`, so the
individual layout terms are effectively double-counted. We reproduce the
same effective objective and keep the same dict keys for logging parity.

Everything here runs inside the jitted train step: CGT label synthesis,
photometric warps, automask, smoothness — no host round-trips.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from ..ops.geometry import backproject, disp_to_depth, project
from ..ops.photometric import reprojection_loss
from ..ops.sampling import resize_area, resize_bilinear
from ..ops.seg_losses import topview_seg_loss
from ..ops.smoothness import edge_aware_smoothness
from .cgt import cgt_scale_label

# Garg/Eigen crop for full-res (375, 1242) KITTI RAW (`net.py:201-205`).
_GARG_CROP = (153, 371, 44, 1197)


def _masked_abs_rel(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    num = jnp.sum(jnp.abs(gt - pred) / jnp.maximum(gt, 1e-6) * mask)
    den = jnp.maximum(jnp.sum(mask), 1.0)
    return num / den


def _scale_loss(depth_pred, scale_label, model_type: str) -> jax.Array:
    """abs-rel against the CGT label over its support (`net.py:193-211`)."""
    h, w = scale_label.shape[1:3]
    depth_pred = jnp.clip(resize_bilinear(depth_pred, h, w), 1e-3, 80.0)
    mask = (scale_label > 0).astype(depth_pred.dtype)
    if model_type == "static_raw":
        t, b_, l, r = _GARG_CROP
        crop = jnp.zeros((h, w), depth_pred.dtype).at[t:b_, l:r].set(1.0)
        mask = mask * crop[None, :, :, None]
    return _masked_abs_rel(depth_pred, scale_label, mask)


def _warped_frames_all(outputs, batch, scales, frame_ids, height, width,
                       min_depth, max_depth, tap_dtype=None,
                       const_vjp=True):
    """Monodepth2 image synthesis for every scale (`net.py:690-702`).

    Numerically identical to the reference's per-scale loop, but each
    source frame is sampled at the 4 scales' grids with ONE gather
    (`grid_sample_multi`): the warps dominate the step profile and their
    cost is per-transaction, not per-element. Returns
    {frame_id: (B, S, H, W, 3)}.
    """
    from ..ops.sampling import grid_sample_multi

    grids = []
    for scale in scales:
        disp = resize_bilinear(outputs[f"disp/{scale}"], height, width)
        _, depth = disp_to_depth(disp, min_depth, max_depth)
        cam_points = backproject(depth, batch["inv_K"])
        per_frame = {}
        for f in frame_ids[1:]:
            # Stereo frame uses the fixed rig baseline (`net.py:695-698`).
            T = batch["stereo_T"] if f == "s" else outputs[f"cam_T_cam/{f}"]
            per_frame[f] = project(cam_points, batch["K"], T, height, width)
        grids.append(per_frame)

    preds = {}
    for i, f in enumerate(frame_ids[1:], start=1):
        stacked = jnp.stack([g[f] for g in grids], axis=1)  # (B,S,H,W,2)
        # img_grad=False: the sampled frames are input data, so the warp
        # uses the const-image custom VJP — the backward keeps only the two
        # analytic grid-tangent fields instead of ~1 GB of tap residuals.
        preds[f] = grid_sample_multi(
            batch["color"][:, i], stacked, padding_mode="border",
            tap_dtype=tap_dtype, img_grad=not const_vjp,
        )
    return preds


def reproj_operand_bf16(cfg, use_preproj: bool, batch_size: int) -> bool:
    """Resolve `pallas_reproj_bf16` ("auto" = kernel on AND batch == 1).

    B>1 is excluded from auto because the Mosaic compiler miscompiles the
    bf16-operand reprojection kernel inside the full train step whenever
    the batch grid dim > 1: B=2 SIGABRTs `tpu_compile_helper`, B=3
    compiles to a non-finite loss (round-5 bisect, `benchmarks/results/
    queue_r5{,b}.jsonl`). Standalone and CPU-interpret parity are clean at
    every B — the kernel math is right; this is a compiler fault. f32
    operands are correct at every B and still beat the no-kernel path
    (10.32 vs 9.88 f/s at B=2 flagship).
    """
    v = cfg.get("pallas_reproj_bf16", "auto")
    if v == "auto":
        return bool(use_preproj) and batch_size == 1
    return bool(v)


def compute_losses(
    outputs: Mapping[Any, jax.Array],
    batch: Mapping[str, jax.Array],
    cfg,
    rng: jax.Array,
) -> dict:
    """Returns the reference-keyed loss dict (all entries are scalars)."""
    model_type = cfg.type
    frame_ids = tuple(cfg.frame_ids)
    scales = tuple(cfg.scales)
    height, width = cfg.height, cfg.width
    num_class = cfg.get("num_class", 2)

    loss = {}

    # Branch gating (`net.py:125-159` root copy — the runnable semantics:
    # the `mono/` copy leaves weightD unbound for single-branch types):
    # static types train the road branch only, dynamic types the vehicle
    # branch only, Argo_both trains both. NOTE: gating the LOSS does not by
    # itself remove the inactive branch's forward from the jitted step —
    # its BatchNorm batch_stats updates flow out through mutable=
    # ["batch_stats"] and keep it alive (the reference also runs both
    # branches, `net.py:75`, relying on find_unused_parameters=True).
    # To actually skip the inactive forward, set cfg.skip_inactive_branch
    # (model `branches` knob) — then the branch is never traced at all.
    seg_kwargs = dict(
        loss_type=cfg.get("loss_type", "iou"),
        loss_sum=int(cfg.get("loss_sum", 1)),
    )

    # ---- BEV layout losses (road branch) --------------------------------
    if model_type in ("static", "static_raw", "Argo_static", "Argo_both"):
        weight_s = jnp.asarray(
            [1.0, float(cfg.get("static_weight", 5.0))], jnp.float32)
        labels_s = batch["bev_static"].astype(jnp.int32)
        sdf_s = batch.get("bev_static_sdf")
        lw_s = float(cfg.get("loss_weightS", cfg.get("loss_weight", 1.0)))
        l2w_s = float(cfg.get("loss2_weightS", cfg.get("loss2_weight", 1.0)))
        loss["topview_loss"] = topview_seg_loss(
            outputs["topview"], labels_s, weight_s, loss_weight=lw_s,
            loss2_weight=l2w_s, sdf=sdf_s, **seg_kwargs)
        loss["transform_topview_loss"] = topview_seg_loss(
            outputs["transform_topview"], labels_s, weight_s, loss_weight=lw_s,
            loss2_weight=l2w_s, sdf=sdf_s, **seg_kwargs)
        loss["transform_loss"] = jnp.mean(
            jnp.abs(outputs["features"] - outputs["retransform_features"]))
        loss["layout_loss"] = (
            loss["topview_loss"]
            + 0.001 * loss["transform_loss"]
            + loss["transform_topview_loss"]
        )

    # ---- BEV layout losses (vehicle branch) ------------------------------
    if model_type in ("dynamic", "Argo_dynamic", "Argo_both"):
        weight_d = jnp.asarray(
            [1.0, float(cfg.get("dynamic_weight", 15.0))], jnp.float32)
        labels_d = batch["bev_dynamic"].astype(jnp.int32)
        sdf_d = batch.get("bev_dynamic_sdf")
        lw_d = float(cfg.get("loss_weight", 1.0))
        l2w_d = float(cfg.get("loss2_weight", 1.0))
        loss["topview_lossB"] = topview_seg_loss(
            outputs["topviewB"], labels_d, weight_d, loss_weight=lw_d,
            loss2_weight=l2w_d, sdf=sdf_d, **seg_kwargs)
        loss["transform_topview_lossB"] = topview_seg_loss(
            outputs["transform_topviewB"], labels_d, weight_d, loss_weight=lw_d,
            loss2_weight=l2w_d, sdf=sdf_d, **seg_kwargs)
        loss["transform_lossB"] = jnp.mean(
            jnp.abs(outputs["featuresB"] - outputs["retransform_featuresB"]))
        loss["layout_lossB"] = (
            loss["topview_lossB"]
            + 0.001 * loss["transform_lossB"]
            + loss["transform_topview_lossB"]
        )

    # ---- CGT scale label --------------------------------------------------
    full_hw = tuple(cfg.get("cgt_label_hw", (375, 1242)))
    split = cfg.get("split", "odometry")
    k3 = batch["odometry_K"][:, :3, :3]
    if model_type in ("static", "static_raw", "Argo_static"):
        scale_label = cgt_scale_label(
            batch["bev_static"], k3, batch["Tr_cam2_velo"], kind="static",
            split=split, occ_map_size=cfg.occ_map_size, out_hw=full_hw)
    elif model_type in ("dynamic", "Argo_dynamic"):
        scale_label = cgt_scale_label(
            None, k3, batch["Tr_cam2_velo"], kind="dynamic",
            split=split, occ_map_size=cfg.occ_map_size, out_hw=full_hw)
    elif model_type == "Argo_both":
        scale_label = cgt_scale_label(
            batch["bev_both"], k3, batch["Tr_cam2_velo"], kind="both",
            split=split, occ_map_size=cfg.occ_map_size, out_hw=full_hw)
    else:
        raise ValueError(f"unknown model type {model_type}")

    # ---- per-scale depth losses -------------------------------------------
    target = batch["color"][:, 0]
    automask = bool(cfg.get("automask", True))
    disp_norm = bool(cfg.get("disp_norm", True))
    smoothness_weight = float(cfg.get("smoothness_weight", 1e-3))
    scale_weight = float(cfg.get("scale_weight", 0.1))
    n_scales = len(scales)

    # Warp taps in bfloat16 by default: sources are 8-bit images, so the
    # 1/255 quantization already dominates bf16's ~0.4% error; halves the
    # gather traffic and the saved-for-backward residuals. cfg knob
    # `warp_tap_dtype` in {"bfloat16", "float32"}.
    import jax.numpy as _jnp

    # "uint8" is lossless for the loader's 8-bit-exact images and halves
    # gather bytes vs bf16 (see ops/sampling.py). Default "auto" = uint8
    # on the TPU backend (round-4 whole-step: 9.97 vs 9.38 f/s alone,
    # 10.65 f/s with fold_upconv), bfloat16 elsewhere (CPU goldens keep
    # their established tolerance story).
    tap_choice = cfg.get("warp_tap_dtype", "auto")
    if tap_choice == "auto":
        import jax as _jax

        tap_choice = "uint8" if _jax.default_backend() == "tpu" else "bfloat16"
    if tap_choice == "uint8":
        import os as _os

        if _os.environ.get("JPERCEIVER_DEBUG_U8"):
            # Opt-in guard for the lossless-u8 invariant (see
            # data/transforms.py::to_array): warp sources must be exactly
            # k/255 or the uint8 tap path silently quantizes them.
            import jax.debug as _jdbg

            def _check_u8(c):
                import numpy as _np

                q = _np.round(_np.asarray(c, _np.float32) * 255.0) / 255.0
                if not _np.allclose(_np.asarray(c, _np.float32), q, atol=1e-6):
                    raise AssertionError(
                        "warp_tap_dtype=uint8 but batch['color'] is not "
                        "8-bit-exact (values != k/255); set warp_tap_dtype "
                        "to bfloat16/float32 for non-8-bit sources")

            _jdbg.callback(_check_u8, batch["color"])
    tap_dtype = {"bfloat16": _jnp.bfloat16, "float32": None,
                 "uint8": _jnp.uint8}[tap_choice]
    all_preds = _warped_frames_all(
        outputs, batch, scales, frame_ids, height, width,
        cfg.min_depth, cfg.max_depth, tap_dtype=tap_dtype,
        # cfg knob `warp_const_vjp` (default on): the const-image custom
        # VJP keeps only the two grid-tangent fields as residuals.
        const_vjp=bool(cfg.get("warp_const_vjp", True)),
    )
    # Photometric terms, batched: identity reprojection is scale-invariant
    # (the reference recomputes the same value each scale; only the 1e-5
    # automask noise is per (scale, frame), preserved below), and ALL
    # SSIM/Charbonnier evaluations — F identity pairs + S*F warped pairs —
    # ride ONE batched pass so the window stats run as a handful of fat ops
    # instead of 10 small per-pair chains.
    fids = list(frame_ids[1:])
    n_f = len(fids)
    b = target.shape[0]
    # Pair-major stack (P, B, H, W, 3): the target rides in UNstacked as
    # (B, H, W, 3) and broadcasts inside ssim/charbonnier, so its window
    # statistics are computed once instead of P times.
    # Identity pairs are pure data (no parameter gradient) — kept in their
    # OWN stack so the warped stack's backward is 8 slices, not 10 (the
    # joint stack forced dead cotangent slices through the SSIM backward).
    ident = jnp.stack(
        [batch["color"][:, i] for i in range(1, n_f + 1)], axis=0)
    # `use_pallas_reproj`: fuse SSIM+charbonnier+frame-min into one Pallas
    # kernel (ops/pallas/reproj.py) — min(identity, min_warped) is the
    # same 2F-way min as the stacked path (min is associative; identity
    # pairs carry no gradient either way). Default "auto" = ON for the
    # TPU backend (round-4 whole-step: 11.28 vs 10.80 f/s with bf16
    # operands at the flagship config; 300-step overfit clean), OFF
    # elsewhere (the CPU interpret path is for parity tests only).
    use_preproj = cfg.get("use_pallas_reproj", "auto")
    if use_preproj == "auto":
        from ..ops.pallas.reproj import HAVE_PALLAS

        use_preproj = HAVE_PALLAS and jax.default_backend() == "tpu"
    use_preproj = bool(use_preproj)
    if use_preproj:
        from ..ops.pallas.reproj import reproj_min_pallas

        targ_pl = jnp.transpose(target, (0, 3, 1, 2))  # (B, C, H, W)
        # bf16 kernel operands (`pallas_reproj_bf16`, default "auto" = on
        # wherever the kernel itself is on AND the batch is 1 — see
        # `reproj_operand_bf16` for the B>1 Mosaic-miscompile exclusion):
        # halves the kernel's HBM traffic; window statistics still
        # accumulate fp32 in VMEM. Same 8-bit-image argument as
        # warp_tap_dtype=bfloat16 (the pre-u8 default for the very same
        # tensors). Set False for fp32 operands.
        if reproj_operand_bf16(cfg, use_preproj, int(target.shape[0])):
            targ_pl = targ_pl.astype(jnp.bfloat16)
            ident = ident.astype(jnp.bfloat16)
        # Identity pairs through the same kernel: frames on the SCALE
        # axis with a singleton frame dim, so the 1-way "min" is the
        # per-pair loss. Pure data — stop_gradient skips the bwd kernel.
        # (Only needed for automasking, like the reference's identity
        # reprojection, `net.py:159-164`.)
        if automask:
            ident_l = jax.lax.stop_gradient(reproj_min_pallas(
                jnp.transpose(ident, (0, 1, 4, 2, 3))[:, :, None],
                targ_pl))  # (F, B, H, W)
        pstack = jnp.stack([all_preds[f] for f in fids], axis=2)
        pstack = jnp.transpose(pstack, (1, 0, 2, 5, 3, 4))  # (S,B,F,C,H,W)
        pstack = pstack.astype(targ_pl.dtype)
        min_warp = reproj_min_pallas(pstack, targ_pl)  # (S, B, H, W)
    else:
        if automask:
            ident_l = jax.lax.stop_gradient(
                reprojection_loss(ident, target)[..., 0])  # (F, B, H, W)
        warp_pairs = []
        for si in range(n_scales):
            warp_pairs += [all_preds[f][:, si] for f in fids]
        preds = jnp.stack(warp_pairs, axis=0)
        rl = reprojection_loss(preds, target)[..., 0]
        warp_l = rl.reshape(n_scales, n_f, b, height, width)
    if automask:
        # iid noise per (scale, frame, pixel), like the reference's
        # per-iteration torch.randn (`net.py:163`); one fused draw.
        rng, sub = jax.random.split(rng)
        # cfg knob `automask_noise` in {"auto", "threefry", "rbg"}: the
        # 1e-5 tie-break noise is the step's only big random draw (S*F*B*
        # H*W values) and threefry generates bits in ~20 rounds of VPU
        # arithmetic per counter; "rbg" routes the SAME (split, folded)
        # key through the TPU's hardware RngBitGenerator instead. The
        # reference's torch.randn is a third generator anyway — only the
        # distribution is parity-relevant. Default "auto" = rbg on TPU,
        # threefry elsewhere (keeps CPU goldens/seeds byte-stable).
        noise_impl = cfg.get("automask_noise", "auto")
        if noise_impl == "auto":
            noise_impl = "rbg" if jax.default_backend() == "tpu" else "threefry"
        if noise_impl == "rbg":
            sub = jax.random.wrap_key_data(
                jnp.tile(jax.random.key_data(sub), 2), impl="rbg")
        noise = jax.random.normal(
            sub, (n_scales, n_f, b, height, width), ident_l.dtype) * 1e-5

    # Progressive image pyramid for the smooth loss: each level halves the
    # previous one (exact for the power-of-2 scale factors; mean-of-means
    # == mean) instead of area-resizing the full-res image per scale.
    img_pyr = target

    for si, scale in enumerate(scales):
        disp = outputs[f"disp/{scale}"]
        _, depth = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)

        if use_preproj:
            min_reconstruct = min_warp[si]
            if automask:
                min_reconstruct = jnp.minimum(
                    min_reconstruct, (ident_l + noise[si]).min(axis=0))
        else:
            per_scale = warp_l[si]
            if automask:
                per_scale = jnp.concatenate(
                    [ident_l + noise[si], per_scale], axis=0)
            min_reconstruct = per_scale.min(axis=0)
        loss[f"min_reconstruct_loss/{scale}"] = min_reconstruct.mean() / n_scales

        loss[f"scale_loss/{scale}"] = (
            scale_weight * _scale_loss(depth, scale_label, model_type)
            / (2 ** scale) / n_scales
        )

        if disp_norm:
            mean_disp = disp.mean(axis=(1, 2), keepdims=True)
            disp = disp / (mean_disp + 1e-7)
        dh, dw = disp.shape[1], disp.shape[2]
        while img_pyr.shape[1] > dh and img_pyr.shape[1] % 2 == 0 \
                and (img_pyr.shape[1] // 2) % dh == 0:
            img_pyr = resize_area(
                img_pyr, img_pyr.shape[1] // 2, img_pyr.shape[2] // 2)
        smooth = edge_aware_smoothness(
            disp, img_pyr if img_pyr.shape[1:3] == (dh, dw) else target)
        loss[f"smooth_loss/{scale}"] = (
            smoothness_weight * smooth / (2 ** scale) / n_scales
        )

    return loss


def total_loss(loss_dict: Mapping[Any, jax.Array]) -> jax.Array:
    """Sum of every entry — `trainer.py:44` semantics (double-count included)."""
    return sum(loss_dict.values())
