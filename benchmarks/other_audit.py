"""Deep audit of the 'other' (elementwise/copy) class — round 5's wall.

The rebuilt ceiling analysis (ceiling.py, DESIGN.md round-5) attributes
47.3 ms of the 85.7 ms flagship device time to the 'other' class: loop
fusions, copies, reshapes — work whose FLOPs are a rounding error against
the ideal model. This tool answers "which fusions, doing what?":

  1. compile the flagship step (same config as ceiling.py / bench.py),
  2. trace N real steps,
  3. for every other-class op above a ms threshold, print its ms/step,
     output shape, and the op-kind histogram + fattest tensors of its
     fused computation body,
  4. bucket the audited fusions by computation-name heuristics
     (transpose/copy/reduce/broadcast content) so the levers rank.

Prints a JSON report; run detached on the real chip:
    python benchmarks/other_audit.py [knob ...] [--steps N] [--top K]
"""

from __future__ import annotations

import collections
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.ceiling import (_DEF, _dims, _prod, classify, parse_hlo,
                                trace_class_ms)


def _comp_bodies(text: str) -> dict[str, list[str]]:
    """computation name -> its instruction lines (optimized HLO text)."""
    comp_re = re.compile(r"^(?:ENTRY )?%?([\w.\-]+) \(.*\) -> .* \{\s*$")
    bodies: dict[str, list[str]] = {}
    comp = None
    for raw in text.splitlines():
        h = comp_re.match(raw)
        if h:
            comp = h.group(1)
            bodies[comp] = []
            continue
        if comp and raw.strip() and raw.strip() != "}":
            bodies[comp].append(raw.rstrip())
    return bodies


_OPNAME = re.compile(r"= *([a-z0-9]+)\[([0-9,]*)\][^ ]* ([a-z0-9\-]+)\(")
# top-level instr name + opcode (tuple-shaped outputs included)
_LINE = re.compile(r"^\s*(?:ROOT )?%?([\w.\-]+) = .*?\s([a-z][a-z0-9\-]*)\(")
_META = re.compile(r'metadata=\{([^}]*)\}')
_MKV = re.compile(r'(\w+)="?([^" ]*)"?')


def parse_meta(text: str) -> tuple[dict, dict]:
    """name -> (opcode, short source attribution) for top-level instrs.

    XLA keeps `metadata={op_name="jit(train_step)/..." source_file=...
    source_line=N}` on most instructions; the op_name's jax scope path is
    the only thing that can attribute a fused copy/reshape back to model
    code, so surface it (trimmed) next to every audited op.
    """
    opcode_of: dict[str, str] = {}
    meta_of: dict[str, str] = {}
    for raw in text.splitlines():
        lm = _LINE.match(raw)
        if not lm:
            continue
        name, opcode = lm.groups()
        opcode_of[name] = opcode
        mm = _META.search(raw)
        if mm:
            kv = dict(_MKV.findall(mm.group(1)))
            op_name = kv.get("op_name", "")
            src = kv.get("source_file", "").rsplit("/", 1)[-1]
            line = kv.get("source_line", "")
            # keep the tail of the jax scope path — the informative part
            tail = "/".join(op_name.split("/")[-2:]) if op_name else ""
            meta_of[name] = f"{tail} @{src}:{line}".strip()
    return opcode_of, meta_of


def summarize_body(lines: list[str], max_items: int = 6) -> dict:
    """Op-kind histogram + fattest tensors of a fused computation body."""
    kinds: collections.Counter = collections.Counter()
    fattest: list[tuple[int, str, str]] = []
    for line in lines:
        m = _OPNAME.search(line)
        if not m:
            continue
        dtype, dims_s, kind = m.groups()
        if kind in ("parameter",):
            continue
        kinds[kind] += 1
        dims = _dims(dims_s)
        bpe = {"bf16": 2, "f16": 2, "u8": 1, "s8": 1, "pred": 1}.get(dtype, 4)
        fattest.append((_prod(dims) * bpe, f"{dtype}[{dims_s}]", kind))
    fattest.sort(reverse=True)
    return {
        "ops": dict(kinds.most_common(12)),
        "fat": [f"{k}:{s} ({b/1e6:.1f} MB)" for b, s, k in fattest[:max_items]],
    }


def main(argv) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))

    from benchmarks.queue_r3 import KNOBS
    from jperceiver_tpu.config import Config
    from jperceiver_tpu.data import synthetic_batch
    from jperceiver_tpu.engine import (build_optimizer, create_train_state,
                                       make_train_step)
    from jperceiver_tpu.models import JPerceiver

    n_steps, top_k = 10, 40
    if "--steps" in argv:
        n_steps = int(argv[argv.index("--steps") + 1])
    if "--top" in argv:
        top_k = int(argv[argv.index("--top") + 1])

    h = w = 1024
    occ = 256
    bsz = 1
    cfg = Config.fromdict(
        dict(
            type="static", split="odometry", frame_ids=[0, -1, 1],
            scales=[0, 1, 2, 3], height=h, width=w, occ_map_size=occ,
            num_class=2, min_depth=0.1, max_depth=100.0, automask=True,
            disp_norm=True, smoothness_weight=1e-3, scale_weight=0.1,
            static_weight=5.0, dynamic_weight=15.0, loss_type="iou",
            loss_sum=3, loss_weight=20, loss2_weight=20, loss_weightS=20,
            loss2_weightS=20, cgt_label_hw=(375, 1242),
            optimizer=dict(type="Adam", lr=1e-4, weight_decay=0),
            optimizer_config=dict(grad_clip=dict(max_norm=35, norm_type=2)),
            lr_config=dict(policy="step", warmup=None, step=[50]),
        )
    )
    knobs = []
    skip = False
    for i, knob in enumerate(argv):
        if skip:
            skip = False
            continue
        if knob in ("--steps", "--top"):
            skip = True
            continue
        if knob.startswith("--"):
            continue
        KNOBS[knob](cfg)
        knobs.append(knob)

    model = JPerceiver(height=h, width=w, occ_map_size=occ,
                       dtype=jnp.bfloat16,
                       branches=JPerceiver._branches_from_cfg(cfg))
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(bsz, h, w, occ).items()}
    tx, _ = build_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(model, tx, batch, jax.random.key(0))
    step = make_train_step(model, cfg, donate=False)

    compiled = step.lower(state, batch, jax.random.key(1)).compile()
    text = compiled.as_text()
    inv = parse_hlo(text)
    cls_of = classify(inv)
    bodies = _comp_bodies(text)

    # warm + trace
    rng = jax.random.key(1)
    st, metrics = step(state, batch, rng)
    float(metrics["loss"])
    trace_dir = tempfile.mkdtemp(prefix="other_audit_")
    jax.profiler.start_trace(trace_dir)
    st = state
    for _ in range(n_steps):
        st, metrics = step(st, batch, rng)
    float(metrics["loss"])
    jax.profiler.stop_trace()

    ms, _top, _unknown = trace_class_ms(trace_dir, n_steps, cls_of)

    # Re-walk the trace for ALL per-op times (trace_class_ms caps at 12).
    import glob
    import gzip

    hits = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    with gzip.open(hits[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    op_tracks = {k for k, v in tids.items() if v == "XLA Ops"}
    per_op: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tracks:
            continue
        per_op[e["name"].lstrip("%")] += e.get("dur", 0)

    # Output shape of each top-level instruction (first pass of parse_hlo
    # rebuilt here cheaply: name -> "dtype[dims]").
    shape_of: dict[str, str] = {}
    for line in text.splitlines():
        d = _DEF.match(line)
        if d:
            m2 = re.search(r"= *([a-z0-9]+)\[([0-9,]*)\]", line)
            if m2:
                shape_of[d.group(1)] = f"{m2.group(1)}[{m2.group(2)}]"

    opcode_of, meta_of = parse_meta(text)

    def _sig(name: str) -> str:
        """Bucket key: opcode, or a body signature for fusions."""
        opcode = opcode_of.get(name, name.rstrip("0123456789.").rstrip("."))
        if opcode != "fusion":
            return opcode
        callee = inv["fusion_calls"].get(name)
        if callee and callee in bodies:
            kinds = summarize_body(bodies[callee])["ops"]
            top3 = "+".join(sorted(kinds, key=kinds.get, reverse=True)[:3])
            return f"fusion[{top3}]"
        return "fusion[?]"

    rows = []
    other_total = 0.0
    buckets: collections.Counter = collections.Counter()
    bucket_n: collections.Counter = collections.Counter()
    by_src: collections.Counter = collections.Counter()
    for name, dur in per_op.most_common():
        cls = cls_of.get(name, "unknown")
        if cls != "other":
            continue
        op_ms = dur / n_steps / 1e3
        other_total += op_ms
        buckets[_sig(name)] += op_ms
        bucket_n[_sig(name)] += 1
        by_src[meta_of.get(name, "?")] += op_ms
        if len(rows) >= top_k:
            continue
        rec = {"op": name, "ms": round(op_ms, 3),
               "out": shape_of.get(name, "?"),
               "src": meta_of.get(name, "?")}
        callee = inv["fusion_calls"].get(name)
        if callee and callee in bodies:
            rec["body"] = summarize_body(bodies[callee])
        if len(rows) < 12:
            # def line (layouts incl.) + consumers — enough to explain a
            # copy: what produced the operand, who needed the new layout.
            pat = re.compile(rf"%{re.escape(name)}\b")
            defl, cons = None, []
            for line in text.splitlines():
                if not pat.search(line):
                    continue
                stripped = line.strip()
                if re.match(rf"^(ROOT )?%{re.escape(name)} = ", stripped):
                    defl = stripped[:360]
                elif len(cons) < 3 and "metadata" in line:
                    cons.append(stripped[:200])
            rec["def"] = defl
            rec["consumers"] = cons
        rows.append(rec)

    out = {
        "config_knobs": knobs,
        "n_steps": n_steps,
        "class_ms": {c: round(v, 2) for c, v in sorted(
            ms.items(), key=lambda kv: -kv[1])},
        "other_total_ms": round(other_total, 2),
        # FULL-tail accounting (the top-K list covers ~1/3 of the class):
        # every other-class op bucketed by opcode / fusion-body signature,
        # and by jax source attribution — so no ms is invisible.
        "buckets_ms": {k: [round(v, 2), bucket_n[k]]
                       for k, v in buckets.most_common(24)},
        "by_src_ms": {k: round(v, 2) for k, v in by_src.most_common(32)},
        "top_other": rows,
    }
    print(json.dumps(out, indent=1), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "other_audit_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1:])
