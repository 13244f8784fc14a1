"""Per-epoch evaluation: depth metrics + BEV layout mIoU/mAP.

Parity target: `DistEvalMonoHook` (`mono/core/evaluation/eval_hooks.py:
27-325`) minus its pathologies — the reference runs batch-1 forwards per
rank and merges results through pickle files on a shared filesystem; here
the forward is a jitted batched step and cross-process aggregation uses
`multihost_utils.process_allgather` on the summary scalars.

Depth protocol (`eval_hooks.py:148-179`):
  disp -> depth (0.1..100) -> resize to GT -> mask gt in (1e-3, 80) ->
  eigen crop (40.8%..98.4% rows, 3.5%..96.4% cols) -> median scaling
  (or fixed 36x for stereo) -> clamp -> compute_errors.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

from ..evaluation.metrics import AverageMeter, compute_depth_errors, mean_iu, mean_precision
from ..ops.geometry import disp_to_depth as _d2d
from .trainer import make_eval_step

MIN_DEPTH, MAX_DEPTH = 1e-3, 80.0  # `eval_hooks.py:14-15`
DEPTH_KEYS = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3", "ratio"]


def eigen_crop_mask(gt: np.ndarray) -> np.ndarray:
    """Eigen evaluation crop (`eval_hooks.py:161-165`)."""
    h, w = gt.shape
    mask = np.logical_and(gt > MIN_DEPTH, gt < MAX_DEPTH)
    crop = np.zeros_like(mask)
    crop[int(0.40810811 * h) : int(0.99189189 * h),
         int(0.03594771 * w) : int(0.96405229 * w)] = 1
    return np.logical_and(mask, crop)


def depth_metrics_single(disp: np.ndarray, gt: np.ndarray,
                         stereo_scale: bool = False) -> dict | None:
    """disp: (h, w) sigmoid disparity; gt: (H, W) sparse metric depth."""
    from PIL import Image

    h, w = gt.shape
    disp_img = Image.fromarray(disp.astype(np.float32), mode="F")
    disp_r = np.asarray(disp_img.resize((w, h), Image.BILINEAR))
    _, depth = _d2d(disp_r, 0.1, 100.0)
    depth = np.asarray(depth)

    mask = eigen_crop_mask(gt)
    if mask.sum() == 0:
        return None
    d = depth[mask]
    g = gt[mask]
    if stereo_scale:
        ratio = 36.0  # `eval_hooks.py:171-174`
    else:
        ratio = np.median(g) / np.median(d)
    d = np.clip(d * ratio, MIN_DEPTH, MAX_DEPTH)
    abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = compute_depth_errors(g, d)
    return dict(abs_rel=abs_rel, sq_rel=sq_rel, rmse=rmse, rmse_log=rmse_log,
                a1=a1, a2=a2, a3=a3, ratio=ratio)


class EvalHook:
    """Callable (state, epoch) -> metrics dict, for Trainer.eval_hook."""

    def __init__(self, model, val_loader: Iterable, cfg,
                 with_depth: bool = True, with_layout: bool = True,
                 max_batches: int | None = None):
        self.model = model
        self.loader = val_loader
        self.cfg = cfg
        self.with_depth = with_depth
        self.with_layout = with_layout
        self.max_batches = max_batches
        self.eval_step = make_eval_step(model, cfg)

    def __call__(self, state, epoch: int) -> dict:
        import jax
        import jax.numpy as jnp

        meters: dict[str, AverageMeter] = {}

        def upd(name, val, n=1):
            meters.setdefault(name, AverageMeter()).update(float(val), n)

        stereo = bool(self.cfg.get("stereo_scale", False))
        model_type = self.cfg.get("type", "static")

        import time

        fwd_time = 0.0
        n_imgs = 0
        n_valid = 0
        for bi, batch in enumerate(self.loader):
            if self.max_batches is not None and bi >= self.max_batches:
                break
            gt_depth = batch.pop("gt_depth", None)
            valid = batch.pop("_valid", None)
            if valid is None:
                valid = np.ones(np.asarray(batch["color"]).shape[0], bool)
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
            t0 = time.perf_counter()
            out = self.eval_step(state, jbatch)
            jax.block_until_ready(out["disp/0"])
            fwd_time += time.perf_counter() - t0
            n_imgs += int(jbatch["color"].shape[0])
            n_valid += int(np.asarray(valid).sum())
            disp = np.asarray(out["disp/0"])[..., 0]

            if self.with_depth and gt_depth is not None:
                for i in range(disp.shape[0]):
                    if not valid[i]:
                        continue
                    m = depth_metrics_single(disp[i], gt_depth[i], stereo)
                    if m:
                        for k, v in m.items():
                            upd(k, v)

            if self.with_layout:
                # Branch outputs may be absent under skip_inactive_branch.
                road_out = out.get("topview")
                veh_out = out.get("topviewB")
                n_b = int(np.asarray(batch["bev_static"]).shape[0])
                if model_type in ("static", "static_raw", "Argo_static",
                                  "Argo_both") and road_out is not None:
                    road_pred = np.argmax(np.asarray(road_out), axis=-1)
                    road_gt = np.asarray(batch["bev_static"]).astype(np.int64)
                    for i in range(n_b):
                        if not valid[i]:
                            continue
                        iou = mean_iu(road_pred[i], road_gt[i])
                        prec = mean_precision(road_pred[i], road_gt[i])
                        # mean_iu spans pred|gt-observed classes, precision
                        # GT-observed only — a single-class GT sample has
                        # no defined class-1 score; skip it (reference
                        # labels always carry both classes).
                        if len(iou) > 1 and len(prec) > 1:
                            upd("road_iou", iou[1])
                            upd("road_map", prec[1])
                if model_type in ("dynamic", "Argo_dynamic",
                                  "Argo_both") and veh_out is not None:
                    veh_pred = np.argmax(np.asarray(veh_out), axis=-1)
                    veh_gt = np.asarray(batch["bev_dynamic"]).astype(np.int64)
                    for i in range(n_b):
                        if not valid[i]:
                            continue
                        iou = mean_iu(veh_pred[i], veh_gt[i])
                        prec = mean_precision(veh_pred[i], veh_gt[i])
                        if len(iou) > 1 and len(prec) > 1:
                            upd("vehicle_iou", iou[1])
                            upd("vehicle_map", prec[1])

        summary = {k: m.avg for k, m in meters.items()}
        counts = {k: m.count for k, m in meters.items()}
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            # Fixed, pre-agreed key list: a host whose shard produced no
            # valid depth GT (or no layout labels) must still contribute
            # identically-shaped arrays to the allgather — per-process
            # sorted(summary) would be ragged/misaligned.
            keys = DEPTH_KEYS + [
                "road_iou", "road_map", "vehicle_iou", "vehicle_map"]
            sums = np.asarray(
                [summary.get(k, 0.0) * counts.get(k, 0) for k in keys]
                + [float(n_valid)])
            ns = np.asarray([counts.get(k, 0) for k in keys] + [1.0],
                            np.float64)
            gathered = multihost_utils.process_allgather(
                np.concatenate([sums, ns])
            )
            gathered = gathered.reshape(jax.process_count(), 2, len(keys) + 1)
            tot = gathered[:, 0].sum(0)
            n = gathered[:, 1].sum(0)
            summary = {
                k: float(tot[i] / n[i])
                for i, k in enumerate(keys) if n[i] > 0
            }
            n_valid = int(tot[len(keys)])
        # Exactness invariant: with rank-strided sharding + padded-tail
        # masking every dataset sample is evaluated exactly once, so this
        # equals len(dataset) (the reference's `range(rank, N, world)`
        # guarantee, `eval_hooks.py:128`).
        summary["n_eval_samples"] = n_valid
        if fwd_time > 0:
            # Local FPS counter, parity with `eval_hooks.py:142-146,246`.
            summary["fps"] = n_imgs / fwd_time
        return summary
