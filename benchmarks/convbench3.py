"""Pallas conv3x3 vs XLA conv at the model's actual hot shapes (TPU).

Each timing chains K iterations inside ONE jitted program with a forced
data dependency (the tunnelled platform adds ~0.4 ms dispatch per
executable and `block_until_ready` is a no-op, so per-op wall-clock from
separate dispatches is meaningless — see DESIGN.md round-1 notes).

  python benchmarks/convbench3.py [--bwd]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 100  # chained iterations per timed program (fori_loop, compiled once)


def main():
    import jax
    import jax.numpy as jnp

    from jperceiver_tpu.ops.pallas.conv3x3 import pallas_conv3x3

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    with_bwd = "--bwd" in sys.argv

    def xla_conv(x, w, b):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype) + b

    # (name, (B, H, W, C), O) — the flagship 1024^2 step's 3x3 sites
    cases = [
        ("layer1_256sq_64",   (1, 256, 256, 64),  64),
        ("layer2_128sq_128",  (1, 128, 128, 128), 128),
        ("layer3_64sq_256",   (1, 64, 64, 256),   256),
        ("stemlike_512sq_64", (1, 512, 512, 64),  64),
        ("dec_merge_256sq_256", (1, 256, 256, 256), 256),
        ("dec_merge_128sq_256", (1, 128, 128, 256), 256),
        ("layout_up_128sq_16", (1, 128, 128, 16), 16),
        ("layout_up_64sq_32",  (1, 64, 64, 32),  32),
        ("pose_l1_96x320_64",  (1, 96, 320, 64), 64),
    ]

    for name, xs, o in cases:
        c = xs[3]
        x = jnp.asarray(
            jax.random.normal(jax.random.key(0), xs, jnp.float32)
        ).astype(jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (3, 3, c, o),
                              jnp.float32).astype(jnp.bfloat16) * 0.1
        b = jnp.zeros((o,), jnp.bfloat16)
        flops = 2 * xs[0] * xs[1] * xs[2] * c * o * 9 * K
        row = {"case": name}

        def null_conv(x, w, b):  # loop/dependency floor to subtract
            return x[..., :1] * 1.0

        def timed(f, with_bwd=with_bwd):
            if with_bwd:
                def one(x, w, b):
                    def loss(x, w, b):
                        return jnp.sum(f(x, w, b).astype(jnp.float32))
                    l, (gx, gw) = jax.value_and_grad(
                        loss, argnums=(0, 1))(x, w, b)
                    return l + jnp.sum(gx).astype(jnp.float32) + jnp.sum(gw)
            else:
                def one(x, w, b):
                    return jnp.sum(f(x, w, b).astype(jnp.float32))

            @jax.jit
            def many(x, w, b):
                def body(_, acc):
                    return acc + one(x + (acc * 1e-30).astype(x.dtype), w, b)
                return jax.lax.fori_loop(0, K, body, jnp.float32(0))

            float(many(x, w, b))  # compile + warm
            t0 = time.perf_counter()
            float(many(x, w, b))  # scalar fetch = the only honest sync
            return time.perf_counter() - t0

        # Floor must include the same per-iteration chain shape as the
        # measured candidates: under --bwd the value_and_grad wrapper adds
        # its own loop overhead, so measure the null op through it too.
        floor = timed(null_conv)
        for label, f in (("xla", xla_conv), ("pallas", pallas_conv3x3)):
            dt = max(timed(f) - floor, 1e-9)
            mult = 3 if with_bwd else 1  # fwd+dgrad+wgrad
            row[f"{label}_ms"] = round(dt / K * 1e3, 3)
            row[f"{label}_tflops"] = round(flops * mult / dt / 1e12, 2)
        row["floor_ms_per_iter"] = round(floor / K * 1e3, 3)
        row["speedup"] = round(row["xla_ms"] / row["pallas_ms"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
