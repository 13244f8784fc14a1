"""Round-3 second-wave measurement queue: whole-step flagship benches.

Runs the knob variants built during the TPU-tunnel outage (DESIGN.md
round-3 second wave) back to back in ONE process (one device claim), and
appends one JSON line per variant to the output file as each completes —
so a wedged tunnel mid-queue still leaves every finished number on disk.

Run DETACHED to completion (never SIGTERM mid-claim — see the round-3
wedge incident in DESIGN.md):
    python benchmarks/queue_r3.py [--out FILE] [variant ...]

With no variant args, runs the standard queue. Variant syntax is a
comma-joined knob list, e.g. `fold_up,u8` (see KNOBS below).
"""

from __future__ import annotations

import gc
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# knob name -> cfg mutation
KNOBS = {
    "base": lambda cfg: None,
    "fold_up": lambda cfg: setattr(cfg, "fold_upconv", True),
    # Post-landing (round 4): fold_upconv and u8 taps are TPU AUTO
    # defaults; these knobs turn them OFF for A/B against the new base.
    "no_fold": lambda cfg: setattr(cfg, "fold_upconv", False),
    "bf16taps": lambda cfg: setattr(cfg, "warp_tap_dtype", "bfloat16"),
    "f32taps": lambda cfg: setattr(cfg, "warp_tap_dtype", "float32"),
    "u8": lambda cfg: setattr(cfg, "warp_tap_dtype", "uint8"),
    "tapcat32": lambda cfg: setattr(cfg, "conv3x3_tapcat_max_ch", 32),
    "tapcat64": lambda cfg: setattr(cfg, "conv3x3_tapcat_max_ch", 64),
    "reproj": lambda cfg: setattr(cfg, "use_pallas_reproj", True),
    "reproj_bf16": lambda cfg: (
        setattr(cfg, "use_pallas_reproj", True),
        setattr(cfg, "pallas_reproj_bf16", True),
    ),
    # Round-4 default flip: the kernel (with bf16 operands) is TPU AUTO
    # default; these knobs turn it off / force fp32 operands for A/B.
    "no_reproj": lambda cfg: setattr(cfg, "use_pallas_reproj", False),
    "reproj_f32": lambda cfg: setattr(cfg, "pallas_reproj_bf16", False),
    "skipb": lambda cfg: setattr(cfg, "skip_inactive_branch", True),
    # Round-4 default flip: single-branch types now skip the inactive
    # branch by default, so "skipb" is a no-op and "bothb" is the A/B.
    "bothb": lambda cfg: setattr(cfg, "skip_inactive_branch", False),
    "mu16": lambda cfg: cfg.optimizer.update(mu_dtype="bfloat16"),
    # Round-5: hardware-RNG automask noise (default "auto" = rbg on TPU);
    # noise3f forces the old threefry draw for A/B.
    "noise3f": lambda cfg: setattr(cfg, "automask_noise", "threefry"),
    "noiserbg": lambda cfg: setattr(cfg, "automask_noise", "rbg"),
    "grp16": lambda cfg: None,  # handled via sampling._GROUP_WIDTH below
    "grp4": lambda cfg: None,
    # Round-5 "other"-class attack knobs:
    # Round-5: share_stem is TPU AUTO default but measured NEUTRAL — the
    # alternating A/B (queue_r5e) refuted queue_r5d's apparent +1.4%
    # (DESIGN.md round-5 postmortem); no_stemshare is the A/B knob.
    "stem_share": lambda cfg: setattr(cfg, "share_stem", True),
    "no_stemshare": lambda cfg: setattr(cfg, "share_stem", False),
    "selbar": lambda cfg: None,  # sampling._SELECT_BARRIER, see measure()
    "outbar": lambda cfg: None,
    # Round-5 deep-channel Pallas conv gate (C>=128 nine-dot sites through
    # the VMEM-tap-resident kernel; ops/pallas/conv3x3.py).
    "pconv_deep": lambda cfg: setattr(cfg, "use_pallas_conv_deep", True),
    "no_pconv_deep": lambda cfg: setattr(cfg, "use_pallas_conv_deep", False),
    # bN -> batch size, handled in measure()
}

DEFAULT_QUEUE = [
    "base",
    "fold_up",
    "u8",
    "tapcat32",
    "reproj",
    "reproj_bf16",
    "grp16",
]


def measure(variant: str, n_iters: int = 15, reps: int = 3) -> dict:
    import jax
    import jax.numpy as jnp

    from jperceiver_tpu.config import Config
    from jperceiver_tpu.data import synthetic_batch
    from jperceiver_tpu.engine import build_optimizer, create_train_state, make_train_step
    from jperceiver_tpu.models import JPerceiver
    from jperceiver_tpu.ops import sampling as _sampling

    h = w = 1024
    occ = 256
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
    grp_prev = _sampling._GROUP_WIDTH
    bar_prev = _sampling._SELECT_BARRIER
    try:
        bsz = 1
        for knob in variant.split(","):
            if knob.startswith("grp"):
                _sampling._GROUP_WIDTH = int(knob[3:])
            elif knob in ("selbar", "outbar"):
                _sampling._SELECT_BARRIER = knob[:3]
            elif knob.startswith("b") and knob[1:].isdigit():
                bsz = int(knob[1:])
            else:
                KNOBS[knob](cfg)

        # Branch selection must honor the skipb knob: hardcoding "both"
        # made the round-4 skipb variant measure the IDENTICAL graph as
        # base (caught via a 28% "delta" that was pure cross-process
        # measurement noise).
        model = JPerceiver(height=h, width=w, occ_map_size=occ,
                           dtype=jnp.bfloat16,
                           branches=JPerceiver._branches_from_cfg(cfg))
        batch = {k: jnp.asarray(v)
                 for k, v in synthetic_batch(bsz, h, w, occ).items()}
        tx, _ = build_optimizer(cfg, steps_per_epoch=1000)
        state = create_train_state(model, tx, batch, jax.random.key(0))
        step = make_train_step(model, cfg)

        rng = jax.random.key(1)
        t_c = time.perf_counter()
        state, metrics = step(state, batch, rng)
        loss0 = float(metrics["loss"])  # honest sync: scalar fetch
        first_step_s = time.perf_counter() - t_c  # compile + one exec

        best = float("inf")
        loss_last = loss0
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n_iters):
                state, metrics = step(state, batch, rng)
            loss_last = float(metrics["loss"])
            best = min(best, (time.perf_counter() - t0) / n_iters)
        return {
            "variant": variant,
            "batch": bsz,
            "step_ms": round(best * 1e3, 2),
            "fps": round(bsz / best, 3),
            "first_step_s": round(first_step_s, 1),
            "loss_finite": bool(math.isfinite(loss0) and math.isfinite(loss_last)),
        }
    finally:
        _sampling._GROUP_WIDTH = grp_prev
        _sampling._SELECT_BARRIER = bar_prev


LOCK_PATH = "/tmp/jperceiver_tpu_bench.lock"


def acquire_bench_lock() -> None:
    """Refuse to run two TPU benches at once: interleaved device claims
    silently corrupt each other's timing loops (round 4: an identical-graph
    variant 'measured' 28% slower than base while a second process ran)."""
    if os.path.exists(LOCK_PATH):
        try:
            pid = int(open(LOCK_PATH).read().strip())
            os.kill(pid, 0)  # raises if dead
            sys.exit(f"another bench (pid {pid}) holds {LOCK_PATH}; "
                     "refusing to corrupt its timings")
        except (ValueError, ProcessLookupError, PermissionError):
            os.unlink(LOCK_PATH)  # stale
    with open(LOCK_PATH, "w") as f:
        f.write(str(os.getpid()))
    import atexit

    atexit.register(lambda: os.path.exists(LOCK_PATH) and os.unlink(LOCK_PATH))


def main(argv) -> None:
    acquire_bench_lock()
    out = "/tmp/queue_r3.jsonl"
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            sys.exit("usage: queue_r3.py [--out FILE] [variant ...]")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    # --ab A B [N]: order-controlled alternating A/B — run A,B,A,B,...
    # (N pairs, default 2) and append a summary row with per-variant means.
    # This is the REQUIRED protocol for deltas under ~1.5%: the round-5
    # share_stem postmortem (DESIGN.md) showed variant-to-variant spread
    # across fresh jits in one process is ~1%, an order of magnitude above
    # the ±0.1% same-jit repeat spread, so a single sequential A/B at that
    # scale measures session drift, not the knob.
    ab_summary = None
    if argv and argv[0] == "--ab":
        if len(argv) < 3:
            sys.exit("usage: queue_r3.py --ab VARIANT_A VARIANT_B [N_PAIRS]")
        a, b = argv[1], argv[2]
        n_pairs = int(argv[3]) if len(argv) > 3 and argv[3].isdigit() else 2
        argv = [a, b] * n_pairs
        ab_summary = (a, b)
    queue = argv or DEFAULT_QUEUE

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    records = []
    for variant in queue:
        try:
            rec = measure(variant)
        except Exception as e:  # keep the queue moving; record the failure
            rec = {"variant": variant, "error": f"{type(e).__name__}: {e}"[:300]}
        line = json.dumps(rec)
        print(line, flush=True)
        with open(out, "a") as f:
            f.write(line + "\n")
        records.append(rec)
        gc.collect()

    if ab_summary is not None:
        a, b = ab_summary
        means = {}
        for v in (a, b):
            fps = [r["fps"] for r in records
                   if r.get("variant") == v and "fps" in r]
            means[v] = round(sum(fps) / len(fps), 3) if fps else None
        rec = {"ab_summary": True, "mean_fps": means,
               "delta_pct": (round((means[b] / means[a] - 1) * 100, 2)
                             if means.get(a) and means.get(b) else None)}
        line = json.dumps(rec)
        print(line, flush=True)
        with open(out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main(sys.argv[1:])
