"""Throughput sweep over (batch, remat, dtype) on the real chip.

Run: python benchmarks/sweep.py [--quick]
Prints one JSON line per configuration; used to pick bench.py's flagship
configuration (VERDICT round 1, next-round item 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(batch_size: int, remat: bool, dtype: str, h: int = 1024,
            n_iters: int = 10, reps: int = 3, cgt_hw=(375, 1242)) -> dict:
    # env knobs for B>=2 memory levers: JP_SWEEP_MU_DTYPE=bfloat16,
    # JP_SWEEP_U8_TAPS=1 (uint8 photometric gather taps),
    # JP_SWEEP_FOLD_UP=1 (fold nearest-up2 into the consuming convs —
    # the saved conv residual is the PRE-up tensor, 1/4 the bytes),
    # JP_SWEEP_PALLAS_REPROJ=1 (fused reprojection loss — no SSIM
    # statistic fields saved for backward).

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    from jperceiver_tpu.config import Config
    from jperceiver_tpu.data import synthetic_batch
    from jperceiver_tpu.engine import build_optimizer, create_train_state, make_train_step
    from jperceiver_tpu.models import JPerceiver

    w = h
    occ = 256 if h >= 1024 else h // 4
    cfg = Config.fromdict(
        dict(
            type="static", split="odometry", frame_ids=[0, -1, 1],
            scales=[0, 1, 2, 3], height=h, width=w, occ_map_size=occ,
            num_class=2, min_depth=0.1, max_depth=100.0, automask=True,
            disp_norm=True, smoothness_weight=1e-3, scale_weight=0.1,
            static_weight=5.0, dynamic_weight=15.0, loss_type="iou",
            loss_sum=3, loss_weight=20, loss2_weight=20, loss_weightS=20,
            loss2_weightS=20, cgt_label_hw=tuple(cgt_hw),
            optimizer=dict(type="Adam", lr=1e-4, weight_decay=0,
                           mu_dtype=os.environ.get("JP_SWEEP_MU_DTYPE")),
            optimizer_config=dict(grad_clip=dict(max_norm=35, norm_type=2)),
            lr_config=dict(policy="step", warmup=None, step=[50]),
        )
    )
    if os.environ.get("JP_SWEEP_U8_TAPS"):
        cfg.warp_tap_dtype = "uint8"
    if os.environ.get("JP_SWEEP_FOLD_UP"):
        cfg.fold_upconv = True
    if os.environ.get("JP_SWEEP_PALLAS_REPROJ"):
        cfg.use_pallas_reproj = True
    model = JPerceiver(
        height=h, width=w, occ_map_size=occ, remat=remat,
        dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32,
    )
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(batch_size, h, w, occ).items()}
    tx, _ = build_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(model, tx, batch, jax.random.key(0))
    step = make_train_step(model, cfg)

    rng = jax.random.key(1)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, rng)
    loss0 = float(metrics["loss"])  # scalar fetch = the only honest sync here
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, metrics = step(state, batch, rng)
        float(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / n_iters)
    return dict(
        batch=batch_size, remat=remat, dtype=dtype, h=h,
        step_ms=round(best * 1e3, 1), fps=round(batch_size / best, 3),
        compile_s=round(compile_s, 1), loss0=round(loss0, 2),
    )


def main() -> None:
    quick = "--quick" in sys.argv
    h = 256 if quick else 1024
    # remat is False / "enc" / "dec" / True (= all trunks). The const-image
    # warp VJP (round 3) cut ~2 GB of backward residuals, so B=2 un-remat'd
    # and the selective modes are the interesting rows now.
    configs = [
        (2, False, "bf16"),
        (2, "enc", "bf16"),
        (2, "dec", "bf16"),
        (3, "enc", "bf16"),
        (3, True, "bf16"),
        (4, True, "bf16"),
    ]
    args = [a for a in sys.argv[1:] if a != "--quick"]
    bad = [a for a in args if a.count(":") != 2]
    if bad:  # unknown flags would otherwise crash parse() below
        sys.exit(f"sweep.py: configs are b:remat:dtype triples "
                 f"(e.g. 2:enc:bf16); got {bad}. Env knobs: JP_SWEEP_*.")
    if args:  # e.g. `sweep.py 2:enc:bf16 3:False:bf16`
        def parse(s):
            b, r, dt = s.split(":")
            r = {"False": False, "True": True}.get(r, r)
            return int(b), r, dt
        configs = [parse(a) for a in args]
    for b, remat, dt in configs:
        try:
            r = measure(b, remat, dt, h=h)
        except Exception as e:  # OOM etc: record and continue
            r = dict(batch=b, remat=remat, dtype=dt, h=h,
                     error=f"{type(e).__name__}: {str(e)[:200]}")
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
