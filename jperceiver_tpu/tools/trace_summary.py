"""Summarize a jax.profiler trace: per-op-category device time per step.

Companion to `profile_step.py` (which writes the trace). Reads the
perfetto-JSON the profiler drops under
`<out>/plugins/profile/<run>/*.trace.json.gz`, filters the "XLA Ops"
device track, and prints (a) an op-duration histogram and (b) the top
categories by HLO-name prefix — the view every round-2/3 optimization was
attributed with (whole-step trace beats standalone microbenches on the
tunnelled chip, where ~0.4 ms dispatch latency per executable swamps
small ops).

  python -m jperceiver_tpu.tools.profile_step --out /tmp/trace --steps 10
  python -m jperceiver_tpu.tools.trace_summary /tmp/trace --steps 10
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def summarize(path: str, n_steps: int, top: int = 30) -> None:
    if os.path.isdir(path):
        hits = sorted(glob.glob(
            os.path.join(path, "plugins", "profile", "*", "*.trace.json.gz")))
        if not hits:
            raise SystemExit(f"no *.trace.json.gz under {path}")
        path = hits[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    events = data["traceEvents"]
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    # The device pid is whichever pid owns an "XLA Ops" thread.
    op_tracks = {k for k, v in tids.items() if v == "XLA Ops"}
    insts: collections.Counter = collections.Counter()
    tot: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tracks:
            continue
        insts[e["name"]] += 1
        tot[e["name"]] += e.get("dur", 0)
    if not tot:
        raise SystemExit("no XLA Ops events found (CPU-only trace?)")
    total_ms = sum(tot.values()) / n_steps / 1e3
    print(f"device op time: {total_ms:.1f} ms/step, "
          f"{sum(insts.values()) / n_steps:.0f} op instances/step")

    buckets: collections.Counter = collections.Counter()
    bsum: collections.Counter = collections.Counter()
    for name, d in tot.items():
        per = d / insts[name]
        if per < 5:
            b = "<5us"
        elif per < 20:
            b = "5-20us"
        elif per < 100:
            b = "20-100us"
        elif per < 1000:
            b = "0.1-1ms"
        else:
            b = ">1ms"
        buckets[b] += insts[name] / n_steps
        bsum[b] += d / n_steps / 1e3
    for b in ["<5us", "5-20us", "20-100us", "0.1-1ms", ">1ms"]:
        print(f"{b:>9}: {buckets[b]:7.0f} ops, {bsum[b]:7.1f} ms")

    cat: collections.Counter = collections.Counter()
    catn: collections.Counter = collections.Counter()
    for name, d in tot.items():
        p = name.split(".")[0]
        cat[p] += d / n_steps / 1e3
        catn[p] += insts[name] / n_steps
    print(f"\ntop {top} categories (HLO-name prefix):")
    for p, d in cat.most_common(top):
        print(f"{d:8.2f} ms  {catn[p]:6.0f} ops  {p}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("trace", help="trace dir (profile_step --out) or .trace.json.gz")
    p.add_argument("--steps", type=int, default=5,
                   help="steps the trace covered (profile_step --steps)")
    p.add_argument("--top", type=int, default=30)
    args = p.parse_args(argv)
    summarize(args.trace, args.steps, args.top)


if __name__ == "__main__":
    main()
