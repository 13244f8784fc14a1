"""Optimizer & LR schedule construction (optax).

Parity with the reference training recipe:
* Adam(lr=1e-4, weight_decay=0) (`config/*.py` `optimizer=`),
* global-norm gradient clip 35 (`optimizer_config.grad_clip`,
  applied in `DistOptimizerHook`, `dist_utils.py:47-60`),
* step LR policy with optional linear warmup
  (`lr_config`, e.g. `config/cfg_kitti_baseline.py:70-77`).

Paramwise bias/norm multipliers (`trainer.py:76-143`) are supported via
optax masks, though no shipped reference config enables them.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import optax


def build_lr_schedule(cfg, steps_per_epoch: int):
    """`lr_config` dict -> optax schedule (per-iteration).

    `policy='step'` drops lr by `gamma` (default 0.1, mmcv default) at the
    epoch milestones in `step`; `warmup='linear'` ramps from
    `lr*warmup_ratio` over `warmup_iters` iterations.
    """
    base_lr = float(cfg.get("learning_rate", cfg.get("lr", 1e-4)))
    lr_cfg = cfg.get("lr_config", None) or {}
    policy = lr_cfg.get("policy", "fixed")

    if policy == "step":
        gamma = float(lr_cfg.get("gamma", 0.1))
        milestones = [int(e) * steps_per_epoch for e in lr_cfg.get("step", [])]
        boundaries = {m: gamma for m in milestones}
        sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    elif policy == "fixed":
        sched = optax.constant_schedule(base_lr)
    else:
        raise ValueError(f"unsupported lr policy: {policy}")

    if lr_cfg.get("warmup", None) == "linear":
        # mmcv semantics (LrUpdaterHook.get_warmup_lr): the warmup factor
        # multiplies the regular schedule's lr AT THE ABSOLUTE iteration —
        # step-LR milestones stay at their absolute positions. (A naive
        # optax.join_schedules would feed `step - warmup_iters` into the
        # post-warmup schedule, shifting every milestone later.)
        import jax.numpy as jnp

        wi = int(lr_cfg.get("warmup_iters", 500))
        ratio = float(lr_cfg.get("warmup_ratio", 1.0 / 3))
        base_sched = sched

        def sched(step):
            frac = jnp.minimum(jnp.asarray(step, jnp.float32), wi) / wi
            factor = 1.0 - (1.0 - frac) * (1.0 - ratio)
            return base_sched(step) * factor

    return sched


def _label_params(params) -> Any:
    """'norm' for BatchNorm scale/bias, 'bias' for other biases, else 'default'.

    Mirrors the regex grouping of `trainer.py:128-137`.
    """

    def label(path, _):
        names = [p.key for p in path if hasattr(p, "key")]
        joined = "/".join(str(n) for n in names)
        if re.search(r"(bn|norm|batchnorm)", joined, re.IGNORECASE):
            return "norm"
        if names and str(names[-1]) == "bias":
            return "bias"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(cfg, steps_per_epoch: int, params=None):
    """cfg -> optax.GradientTransformation (+ schedule for logging)."""
    opt_cfg = cfg.get("optimizer", {"type": "Adam", "lr": 1e-4})
    opt_type = opt_cfg.get("type", "Adam").lower()
    wd = float(opt_cfg.get("weight_decay", 0.0))
    sched = build_lr_schedule(
        {"learning_rate": opt_cfg.get("lr", 1e-4), "lr_config": cfg.get("lr_config")},
        steps_per_epoch,
    )

    if opt_type == "adam":
        # Optional low-precision first moment (`optimizer.mu_dtype`,
        # e.g. "bfloat16"): the Adam mu tensors are the largest part of
        # optimizer HBM after ZeRO; bf16 mu frees ~param-size bytes for
        # the B>=2 single-chip configs (nu stays fp32 — its magnitudes
        # span too many decades for bf16). Off by default (exact parity).
        mu_dtype = opt_cfg.get("mu_dtype", None)
        if wd:
            core = optax.adamw(sched, weight_decay=wd, mu_dtype=mu_dtype)
        else:
            core = optax.adam(sched, mu_dtype=mu_dtype)
    elif opt_type == "sgd":
        core = optax.sgd(sched, momentum=opt_cfg.get("momentum", 0.9))
    else:
        raise ValueError(f"unsupported optimizer: {opt_type}")

    pw = opt_cfg.get("paramwise_options")
    if pw and params is not None:
        bias_lr_mult = float(pw.get("bias_lr_mult", 1.0))
        labels = _label_params(params)
        core = optax.multi_transform(
            {
                "default": core,
                "norm": core,
                "bias": optax.chain(core, optax.scale(bias_lr_mult)),
            },
            labels,
        )

    clip = None
    oc = cfg.get("optimizer_config", None)
    if oc and oc.get("grad_clip"):
        clip = float(oc["grad_clip"].get("max_norm", 35.0))
    tx = optax.chain(optax.clip_by_global_norm(clip), core) if clip else core
    return tx, sched
