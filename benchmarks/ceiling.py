"""Achievable-ceiling analysis: what f/s can THIS chip reach on this step?

VERDICT r3 item 9: decompose the flagship step's work into MXU-class
(dot), conv-class (any convolutions XLA still lowers natively), and
gather-class (the photometric warp), apply MEASURED per-class rooflines,
and state the max frames/s a perfect scheduler could reach — so the
remaining `vs_north_star` gap can be split into "scheduling losses we can
still attack" vs "work the chip physically cannot do faster".

Method (all from the real compiled artifact, not estimates):
  1. Compile the flagship train step on the TPU; walk the optimized HLO.
  2. Every `dot` instruction: FLOPs = 2 * |out| * K (exact, per shape).
     Every `convolution`: FLOPs = 2 * |out| * prod(kernel_spatial) * Cin/g.
     Every `gather`: rows = |out| / prod(slice_sizes).
  3. Measure dot throughput AT THE STEP'S OWN dominant shapes (top-N by
     FLOPs) — a 64-channel dot cannot run at the 8192^2 roofline, so the
     per-shape measurement is the honest per-class ceiling.
  4. ceiling = B / (sum_shapes flops_s / tput_s  +  conv_flops / R_conv
                    + gather_rows / R_gather)
     plus an "ideal" variant with ALL flops at the 8192^2 matmul roofline.

Writes benchmarks/ceiling.json (bench.py surfaces `ceiling_fps` from it)
and prints one JSON line. Run detached on the real chip:
    python benchmarks/ceiling.py [--skip-measure]
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE = re.compile(r"(?:bf16|f32|f16|s32|u32|s8|u8|pred)\[([0-9,]*)\]")


def _dims(s: str) -> list[int]:
    return [int(x) for x in s.split(",") if x] if s else []


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= x
    return out


_DEF = re.compile(r"^\s*(?:ROOT )?%([\w.\-]+) = ([a-z0-9]+)\[([0-9,]*)\]")
_OPERAND = re.compile(r"%([\w.\-]+)")


def parse_hlo(text: str) -> dict:
    """Exact work inventory from optimized-HLO text.

    Operands are printed as bare `%name` refs (no inline shapes) in this
    XLA version, so a first pass builds a name -> dims symbol table.
    """
    shapes: dict[str, list[int]] = {}
    for line in text.splitlines():
        d = _DEF.match(line)
        if d:
            shapes[d.group(1)] = _dims(d.group(3))

    dots: dict[tuple, float] = {}  # (M, K, N) -> flops
    convs: dict[tuple, float] = {}  # (kspatial, Cin, O) -> flops
    conv_flops = 0.0
    gather_rows = 0
    gather_bytes = 0

    for line in text.splitlines():
        line = line.strip()
        m = re.search(r"= *([a-z0-9]+)\[([0-9,]*)\][^ ]* (dot|convolution|gather)\(", line)
        if not m:
            continue
        out_dims = _dims(m.group(2))
        op = m.group(3)
        paren = line[m.end():line.index(")", m.end())]
        arg_shapes = [shapes[n] for n in _OPERAND.findall(paren) if n in shapes]

        if op == "dot":
            lc = re.search(r"lhs_contracting_dims=\{([0-9,]*)\}", line)
            if not arg_shapes or lc is None:
                continue
            lshape = arg_shapes[0]
            k = _prod(lshape[int(d)] for d in lc.group(1).split(",") if d)
            flops = 2.0 * _prod(out_dims) * k
            # Bucket by (M, K, N) with batch dims folded into M.
            n_dim = out_dims[-1] if out_dims else 1
            m_dim = _prod(out_dims) // max(1, n_dim)
            key = (m_dim, k, n_dim)
            dots[key] = dots.get(key, 0.0) + flops
        elif op == "convolution":
            if len(arg_shapes) < 2:
                continue
            kshape = arg_shapes[1]
            dl = re.search(r"dim_labels=\w+_(\w+)->", line)
            if dl:
                klabels = dl.group(1)  # e.g. '01io' / 'io' (dot-as-conv)
                cin = kshape[klabels.index("i")]
                kspatial = [kshape[i] for i, c in enumerate(klabels)
                            if c not in ("i", "o")]
            else:
                cin, kspatial = kshape[-2], list(kshape[:-2])
            # XLA:TPU canonicalizes EVERY dot_general to a convolution:
            # plain dots print as `dim_labels=bf_io->bf` (no spatial),
            # and batched dots / `jax.image.resize` print with big
            # non-reduced RIDER dims in the kernel (e.g. window=256x2x2
            # for a bilinear resize) — multiplying by those overcounted
            # the step 4x. Real conv kernels here are <=7; treat larger
            # kernel dims as riders (each output reads ONE slice).
            spatial = _prod(d for d in kspatial if d <= 7)
            g = re.search(r"feature_group_count=(\d+)", line)
            groups = int(g.group(1)) if g else 1
            flops = 2.0 * _prod(out_dims) * spatial * cin / groups
            if not kspatial or all(d > 7 or d == 1 for d in kspatial):
                # Pure contraction: dot-as-conv (no spatial / rider-only)
                # or 1x1-kernel conv (CCT q/k/v etc.) — MXU class,
                # bucketed by (M, K, N) like a dot.
                n_dim = kshape[klabels.index("o")] if dl else kshape[-1]
                m_dim = _prod(out_dims) // max(1, n_dim)
                key = (m_dim, int(spatial * cin), n_dim)
                dots[key] = dots.get(key, 0.0) + flops
            else:
                conv_flops += flops
                key = (tuple(d for d in kspatial if d <= 7), cin,
                       kshape[klabels.index("o")] if dl else kshape[-1])
                convs[key] = convs.get(key, 0.0) + flops
        else:  # gather
            ss = re.search(r"slice_sizes=\{([0-9,]*)\}", line)
            if ss is None:
                continue
            slice_elems = _prod(_dims(ss.group(1)))
            rows = _prod(out_dims) // max(1, slice_elems)
            gather_rows += rows
            bytes_per = {"bf16": 2, "f16": 2, "u8": 1, "s8": 1}.get(m.group(1), 4)
            gather_bytes += _prod(out_dims) * bytes_per

    return {"dots": dots, "convs": convs, "conv_flops": conv_flops,
            "gather_rows": gather_rows, "gather_bytes": gather_bytes}


def measure_dot(mm, kk, nn, chain=50) -> float:
    """Measured TFLOP/s of an (M,K)@(K,N) bf16 dot on this chip.

    Chained fori_loop with a null-op floor subtracted (the convbench3
    methodology): per-dispatch timing through the tunnel has a ~ms floor
    that swamps small shapes — an isolated probe 'measured' the step's
    dominant (16384,64,256) dot at 0.12 TFLOP/s, 100x under its
    in-program rate."""
    import jax
    import jax.numpy as jnp

    a = jnp.ones((mm, kk), jnp.bfloat16)
    b = jnp.ones((kk, nn), jnp.bfloat16)

    def timed(f):
        @jax.jit
        def many(x, y):
            def body(_, acc):
                return acc + f(x + (acc * 1e-30).astype(x.dtype), y)
            return jax.lax.fori_loop(0, chain, body, jnp.float32(0))

        float(many(a, b))  # compile + warm
        t0 = time.perf_counter()
        float(many(a, b))  # scalar fetch = the only honest sync
        return time.perf_counter() - t0

    def dot_probe(x, y):
        # optimization_barrier keeps the FULL dot live so the one-element
        # carry neither DCEs it nor lets the simplifier shrink it to a
        # 1-row dot; a jnp.sum carry instead costs a full (M, N) pass
        # that dominates K-starved shapes.
        out = jax.lax.optimization_barrier(jnp.matmul(x, y))
        return out[0, 0].astype(jnp.float32)

    floor = timed(lambda x, y: x[0, 0].astype(jnp.float32))
    dt = max(timed(dot_probe) - floor, 1e-9)
    return 2.0 * mm * kk * nn * chain / dt / 1e12


def measure_gather_rate(rows=4 * 1024 * 1024, width=128, iters=5) -> float:
    """Measured rows/s on the warp's wide-row access pattern.

    Uses the SAME lax.gather form as `ops/sampling._take_rows` (full
    `width`-lane rows, PROMISE_IN_BOUNDS): a take_along_axis probe
    gathered 1-element rows and under-reported the warp's rate 6x."""
    import jax
    import jax.numpy as jnp

    from jperceiver_tpu.ops.sampling import _take_rows

    src = jnp.ones((1026 * 1026 // 8, width), jnp.bfloat16)
    idx = jnp.arange(rows, dtype=jnp.int32) % (1026 * 1026 // 8)
    f = jax.jit(lambda s, i: _take_rows(s, i))
    f(src, idx)
    float(jnp.sum(f(src, idx)[:, 0].astype(jnp.float32)))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = f(src, idx)
    float(jnp.sum(out[:, 0].astype(jnp.float32)))
    return rows / ((time.perf_counter() - t0) / iters)


def main(argv) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))

    from benchmarks.queue_r3 import KNOBS  # noqa: F401 (same config source)
    from jperceiver_tpu.config import Config
    from jperceiver_tpu.data import synthetic_batch
    from jperceiver_tpu.engine import (build_optimizer, create_train_state,
                                       make_train_step)
    from jperceiver_tpu.models import JPerceiver

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
    for knob in argv:
        if knob.startswith("--"):
            continue
        KNOBS[knob](cfg)

    # Same branch selection as bench.py's primary config (single-branch
    # since the round-4 skip_inactive_branch default flip).
    model = JPerceiver(height=h, width=w, occ_map_size=occ,
                       dtype=jnp.bfloat16,
                       branches=JPerceiver._branches_from_cfg(cfg))
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(bsz, h, w, occ).items()}
    tx, _ = build_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(model, tx, batch, jax.random.key(0))
    step = make_train_step(model, cfg, donate=False)

    lowered = step.lower(state, batch, jax.random.key(1))
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    total_flops = float(cost.get("flops", 0.0))
    hlo = compiled.as_text()
    inv = parse_hlo(hlo)

    dot_flops = sum(inv["dots"].values())
    other_flops = max(0.0, total_flops - dot_flops - inv["conv_flops"])

    # Top dot shapes by FLOPs — these get their own measured throughput.
    top = sorted(inv["dots"].items(), key=lambda kv: -kv[1])[:10]
    covered = sum(f for _, f in top)

    skip_measure = "--skip-measure" in argv
    r_mm_peak = 103.0e12  # benchmarks/roofline.py 8192^2 bf16, re-measured below
    shape_rows = []
    t_dots_measured = 0.0
    if not skip_measure:
        r_mm_peak = measure_dot(8192, 8192, 8192) * 1e12
        r_gather = measure_gather_rate()
        for (mm, kk, nn), fl in top:
            # Cap the probe's M so a single probe fits VMEM/HBM sanely.
            mm_p = min(mm, 4 * 1024 * 1024)
            tput = measure_dot(mm_p, kk, nn) * 1e12
            shape_rows.append({"m": mm, "k": kk, "n": nn,
                               "gflops": round(fl / 1e9, 1),
                               "tflops_per_s": round(tput / 1e12, 2)})
            t_dots_measured += fl / tput
        # Tail dots (not in top-10) assumed at the weighted mean of the top.
        if covered > 0:
            mean_tput = covered / t_dots_measured
            t_dots_measured += (dot_flops - covered) / mean_tput
    else:
        r_gather = 540e6  # DESIGN.md round-3 measured wide-row ceiling
        t_dots_measured = dot_flops / (0.35 * r_mm_peak)  # placeholder

    r_conv = 20e12  # measured conv band midpoint (roofline.py: 14-32)
    t_conv = inv["conv_flops"] / r_conv
    t_gather = inv["gather_rows"] / r_gather
    t_ideal = total_flops / r_mm_peak + t_gather
    t_classes = t_dots_measured + t_conv + t_gather

    out = {
        "config_knobs": [a for a in argv if not a.startswith("--")],
        "total_tflops_per_step": round(total_flops / 1e12, 3),
        "dot_tflops": round(dot_flops / 1e12, 3),
        "conv_tflops": round(inv["conv_flops"] / 1e12, 3),
        "other_tflops": round(other_flops / 1e12, 3),
        "gather_mrows": round(inv["gather_rows"] / 1e6, 1),
        "gather_gb": round(inv["gather_bytes"] / 1e9, 2),
        "r_matmul_peak_tflops": round(r_mm_peak / 1e12, 1),
        "r_gather_mrows_s": round(r_gather / 1e6, 1),
        "top_dot_shapes": shape_rows,
        "top_conv_shapes": [
            {"kspatial": list(ks), "cin": ci, "o": o,
             "gflops": round(fl / 1e9, 1)}
            for (ks, ci, o), fl in sorted(
                inv["convs"].items(), key=lambda kv: -kv[1])[:8]],
        "t_dots_ms": round(t_dots_measured * 1e3, 2),
        "t_conv_ms": round(t_conv * 1e3, 2),
        "t_gather_ms": round(t_gather * 1e3, 2),
        # Everything at the big-matmul roofline + gathers at their ceiling:
        # the number the chip cannot exceed no matter the scheduler.
        "ceiling_fps_ideal": round(bsz / t_ideal, 2),
        # Dots at their MEASURED per-shape throughput: the realistic
        # perfect-scheduling ceiling for THIS lowering.
        "ceiling_fps_measured_classes": round(bsz / t_classes, 2),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ceiling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
