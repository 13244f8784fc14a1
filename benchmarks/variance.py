"""Bench variance characterization (VERDICT r3 item 5): run bench.py's
measurement N times back-to-back IN ONE PROCESS (one device claim, one
compile) and report mean/min/max/spread of the per-run best step time.

    python benchmarks/variance.py [--runs 5] [--out FILE]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.queue_r3 import acquire_bench_lock, measure


def main(argv) -> None:
    acquire_bench_lock()
    runs = 5
    if "--runs" in argv:
        runs = int(argv[argv.index("--runs") + 1])
    out = None
    if "--out" in argv:
        out = argv[argv.index("--out") + 1]

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))

    fps = []
    for i in range(runs):
        rec = measure("base")  # new defaults = the driver bench config
        fps.append(rec["fps"])
        print(json.dumps({"run": i, **rec}), flush=True)
    summary = {
        "runs": runs,
        "fps_mean": round(statistics.mean(fps), 3),
        "fps_min": min(fps),
        "fps_max": max(fps),
        "fps_spread_pct": round(100 * (max(fps) - min(fps)) / statistics.mean(fps), 2),
        "fps_stdev": round(statistics.stdev(fps), 3) if runs > 1 else 0.0,
    }
    line = json.dumps(summary)
    print(line, flush=True)
    if out:
        with open(out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main(sys.argv[1:])
