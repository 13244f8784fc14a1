"""Offline eigen-split depth evaluation.

Parity with `scripts/eval_depth_eigen.py:22-117`: run the depth net over a
val split, median-scale, eigen-crop, clamp to [1e-3, 80], print the
standard 8-column table plus the scale-awareness ratio med/std.

  python -m jperceiver_tpu.tools.eval_depth --config cfg.py \
      --checkpoint work_dir [--epoch N]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True, help="work dir with checkpoints/")
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--max_batches", type=int, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import Config
    from ..data import DataLoader, get_dataset
    from ..engine import (build_optimizer, create_train_state,
                          enable_compile_cache, make_eval_step)
    from ..engine.checkpoint import load_weights
    from ..engine.eval_hook import depth_metrics_single
    from ..models import build_model

    enable_compile_cache()

    cfg = Config.fromfile(args.config)
    model_cfg = cfg.model
    model = build_model(model_cfg)
    ds = get_dataset(cfg.data, training=False)
    loader = DataLoader(ds, batch_size=1, shuffle=False, num_workers=4)

    tx, _ = build_optimizer(cfg, 1000)
    sample = next(iter(loader))
    jb = {k: jnp.asarray(v) for k, v in sample.items() if k != "gt_depth"}
    state = create_train_state(model, tx, jb, jax.random.key(0))
    state = load_weights(args.checkpoint, state, epoch=args.epoch)

    eval_step = make_eval_step(model, model_cfg)
    rows = []
    ratios = []
    for bi, batch in enumerate(loader):
        if args.max_batches and bi >= args.max_batches:
            break
        gt = batch.pop("gt_depth", None)
        if gt is None:
            continue
        out = eval_step(state, {k: jnp.asarray(v) for k, v in batch.items()})
        disp = np.asarray(out["disp/0"])[..., 0]
        for i in range(disp.shape[0]):
            m = depth_metrics_single(disp[i], gt[i], cfg.data.get("stereo_scale", False))
            if m:
                ratios.append(m.pop("ratio"))
                rows.append([m[k] for k in
                             ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")])

    if not rows:
        print("no ground-truth depth found in the val split "
              "(set data.raw_calib_root / use a velodyne-equipped split)")
        return None
    rows = np.asarray(rows)
    ratios = np.asarray(ratios)
    names = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]
    print(("{:>10}" * 7).format(*names))
    print(("{:10.3f}" * 7).format(*rows.mean(axis=0)))
    print(f" Scaling ratios | med: {np.median(ratios):.3f} | "
          f"std: {np.std(ratios / np.median(ratios)):.3f}")
    return rows.mean(axis=0)


if __name__ == "__main__":
    main()
