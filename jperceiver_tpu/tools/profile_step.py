"""Capture a jax.profiler trace of the training step.

The reference's only "profiling" is a tick counter around eval forwards
(`eval_hooks.py:142-146`); here the full jitted train step is traced with
the XLA profiler (view in TensorBoard / xprof) plus a wall-clock summary.

  python -m jperceiver_tpu.tools.profile_step --config cfg.py --out /tmp/trace \
      [--steps 5] [--height 256]
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="preset path; default flagship")
    p.add_argument("--out", required=True)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--height", type=int, default=None,
                   help="override input resolution (and occ=h//4)")
    p.add_argument("--dots", action="store_true",
                   help="enable the nine-shifted-matmul conv lowering")
    p.add_argument("--pallas-conv", action="store_true",
                   help="route eligible 3x3 convs through the Pallas kernel")
    p.add_argument("--pallas-reproj", action="store_true",
                   help="fused SSIM+charbonnier+frame-min Pallas kernel")
    p.add_argument("--u8-taps", action="store_true",
                   help="uint8 photometric gather taps")
    p.add_argument("--fold-upconv", action="store_true",
                   help="fold nearest-up2 into the consuming convs")
    args = p.parse_args(argv)

    import os

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))

    from ..config import Config
    from ..data import synthetic_batch
    from ..engine import build_optimizer, create_train_state, make_train_step
    from ..models import JPerceiver, build_model

    if args.config:
        cfg = Config.fromfile(args.config)
        model_cfg = cfg.model
        for key in ("type", "split"):
            model_cfg.setdefault(key, cfg.data.get(key, "static"))
        if args.height:  # apply BEFORE build_model so geometry constants match
            model_cfg.height = model_cfg.width = args.height
            model_cfg.occ_map_size = args.height // 4
        model = build_model(model_cfg)
        h, w, occ = model_cfg.height, model_cfg.width, model_cfg.occ_map_size
    else:
        h = w = args.height or 1024
        occ = h // 4
        # Identical dict to bench.py's flagship config so the persistent
        # compilation cache is shared between bench and profile runs.
        model_cfg = Config.fromdict(
            dict(type="static", split="odometry", frame_ids=[0, -1, 1],
                 scales=[0, 1, 2, 3], height=h, width=w, occ_map_size=occ,
                 num_class=2, min_depth=0.1, max_depth=100.0, automask=True,
                 disp_norm=True, smoothness_weight=1e-3, scale_weight=0.1,
                 static_weight=5.0, dynamic_weight=15.0, loss_type="iou",
                 loss_sum=3, loss_weight=20, loss2_weight=20, loss_weightS=20,
                 loss2_weightS=20, cgt_label_hw=(375, 1242),
                 optimizer=dict(type="Adam", lr=1e-4, weight_decay=0),
                 optimizer_config=dict(grad_clip=dict(max_norm=35, norm_type=2)),
                 lr_config=dict(policy="step", warmup=None, step=[50])))
        # Branch selection must match bench.py's primary config (the
        # round-4 skip_inactive_branch default flip): without it this
        # traced the BOTH-branch graph — a different (and cold-compiling)
        # executable than the one the bench measures.
        model = JPerceiver(height=h, width=w, occ_map_size=occ,
                           dtype=jnp.bfloat16,
                           branches=JPerceiver._branches_from_cfg(model_cfg))
    if args.pallas_conv:
        model_cfg.use_pallas_conv = True
    if args.dots:
        model_cfg.conv3x3_dots = True
    if args.pallas_reproj:
        model_cfg.use_pallas_reproj = True
    if args.u8_taps:
        model_cfg.warp_tap_dtype = "uint8"
    if args.fold_upconv:
        model_cfg.fold_upconv = True

    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(1, h, w, occ).items()}
    tx, _ = build_optimizer(model_cfg, 1000)
    state = create_train_state(model, tx, batch, jax.random.key(0))
    step = make_train_step(model, model_cfg)
    rng = jax.random.key(1)

    state, m = step(state, batch, rng)  # compile
    float(m["loss"])

    jax.profiler.start_trace(args.out)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step(state, batch, rng)
    float(m["loss"])
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced {args.steps} steps, {dt / args.steps * 1e3:.1f} ms/step "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
