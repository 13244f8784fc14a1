"""Inference (eval-mode) throughput of the flagship model on one chip.

Counterpart of the reference's eval-hook FPS counter
(`eval_hooks.py:142-146,246` — measured per eval batch, never published).
Runs the eval forward (all outputs incl. pose, no losses) at the flagship
1024x1024 configuration and prints one JSON line.

  python benchmarks/infer_bench.py [--quick]

Measured (tunnelled v5e, bf16, 1024x1024 B=1, full joint forward —
depth pyramid + pose + dual BEV branches): 65 f/s round 2 (15.4
ms/frame), 60.7 f/s round-5 re-measure under the train-tuned TPU
defaults (session drift and the dots/fold lowerings land within a few
percent of each other in eval mode).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    from jperceiver_tpu.data import synthetic_batch
    from jperceiver_tpu.engine import make_eval_step
    from jperceiver_tpu.engine.train_state import TrainState
    from jperceiver_tpu.models import JPerceiver

    quick = "--quick" in sys.argv
    h = w = 256 if quick else 1024
    occ = h // 4
    batch_size = 1

    model = JPerceiver(height=h, width=w, occ_map_size=occ,
                       dtype=jnp.bfloat16)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(batch_size, h, w, occ).items()}
    variables = jax.jit(
        lambda rngs, b: model.init(rngs, b, train=False, with_pose=True)
    )({"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), opt_state=(), tx=None)
    step = make_eval_step(model)

    out = step(state, batch)  # compile
    float(jnp.sum(out["disp/0"]))  # scalar fetch = the only honest sync

    n_iters = 5 if quick else 30
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(n_iters):
            out = step(state, batch)
            # chain a data dependency so the loop can't collapse
            acc = out["disp/0"] if acc is None else acc + out["disp/0"]
        float(jnp.sum(acc))
        best = min(best, (time.perf_counter() - t0) / n_iters)
    fps = batch_size / best

    print(json.dumps({
        "metric": f"infer_fps_per_chip_{h}x{w}_b{batch_size}_bf16",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
    }))


if __name__ == "__main__":
    main()
