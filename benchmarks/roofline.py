"""Chip roofline microbenches: matmul/conv peak and HBM bandwidth.

Calibrates the practical ceiling of the (tunnelled, known-degraded) chip so
bench numbers can be read against it. Prints one JSON line per probe.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=10):
    fn(*args)  # compile
    import jax
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    n = 8192
    for dt in (jnp.float32, jnp.bfloat16):
        a = jnp.ones((n, n), dt)
        b = jnp.ones((n, n), dt)
        f = jax.jit(lambda x, y: x @ y)
        dt_s = timeit(f, a, b)
        print(json.dumps({"probe": f"matmul_{n}_{dt.__name__}",
                          "tflops": round(2 * n**3 / dt_s / 1e12, 2)}), flush=True)

    # fat 3x3 conv, resnet-ish shape at 1024^2
    for dtname, dt in (("float32", jnp.float32), ("bfloat16", jnp.bfloat16)):
        x = jnp.ones((1, 256, 256, 256), dt)
        k = jnp.ones((3, 3, 256, 256), dt)
        conv = jax.jit(lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
        dt_s = timeit(conv, x, k)
        flops = 2 * 256 * 256 * 256 * 256 * 9
        print(json.dumps({"probe": f"conv3x3_256ch_256sq_{dtname}",
                          "tflops": round(flops / dt_s / 1e12, 2)}), flush=True)

    # HBM bandwidth: big copy-scale
    x = jnp.ones((512, 1024, 1024), jnp.float32)  # 2 GB
    f = jax.jit(lambda x: x * 1.0001)
    dt_s = timeit(f, x, iters=5)
    gb = 2 * x.size * 4 / 1e9
    print(json.dumps({"probe": "hbm_copy", "GBps": round(gb / dt_s, 1)}), flush=True)

    # gather transaction rate: the photometric warp's access pattern
    src = jnp.ones((1, 1026 * 1026, 12), jnp.float32)
    idx = jnp.arange(4 * 1024 * 1024, dtype=jnp.int32) % (1026 * 1026)
    idx = idx[None, :, None]
    g = jax.jit(lambda s, i: jnp.take_along_axis(s, i, axis=1))
    dt_s = timeit(g, src, idx, iters=5)
    print(json.dumps({"probe": "gather_12ch_4M", "Mgathers_per_s":
                      round(4 * 1024 * 1024 / dt_s / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
