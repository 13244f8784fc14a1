"""Photometric-warp gather microbench: row width & tap dtype sweep.

Times `grid_sample_multi` standalone on the EXACT flagship photometric
shape (one (1,1024,1024,3) source frame sampled at 4 full-res grids =
4.19M output pixels) while sweeping:

  - `_GROUP_WIDTH` (x-positions per gather row; row = width x 16 lanes)
  - tap dtype (bfloat16 vs float32)

The warp is ~7.8 ms/gather in the flagship trace at the measured 540M
rows/s 128-lane ceiling (138 GB/s, vs 325 GB/s plain-copy HBM) — this
probes whether wider rows (256/512 lanes) buy more bandwidth. Per-op
numbers here are only a SCREEN: the tunnelled chip adds ~0.4 ms dispatch
per executable and fusion context differs, so any winner must be
confirmed by a whole-step `bench.py` run before landing (round-3 rule).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from jperceiver_tpu.ops import sampling

    b, h, w, c, s = 1, 1024, 1024, 3, 4
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (b, h, w, c), jnp.bfloat16)
    # Realistic near-identity warp grids (small offsets, like ego-motion).
    k1, k2 = jax.random.split(key)
    base_x = jnp.linspace(-1, 1, w)[None, None, None, :]
    base_y = jnp.linspace(-1, 1, h)[None, None, :, None]
    off = jax.random.uniform(k2, (b, s, h, w, 2), jnp.float32, -0.05, 0.05)
    grids = jnp.stack(
        [jnp.broadcast_to(base_x, (b, s, h, w)) + off[..., 0],
         jnp.broadcast_to(base_y, (b, s, h, w)) + off[..., 1]], axis=-1)

    def run(tap_dtype):
        fn = jax.jit(lambda i, g: jnp.sum(
            sampling.grid_sample_multi(
                i, g, padding_mode="border", tap_dtype=tap_dtype,
                img_grad=False).astype(jnp.float32)))
        out = fn(img, grids)
        float(out)  # compile+sync
        t0 = time.perf_counter()
        n_it = 20
        acc = 0.0
        for _ in range(n_it):
            acc += float(fn(img, grids))
        dt = (time.perf_counter() - t0) / n_it
        return dt

    for grp in (8, 16, 32):
        sampling._GROUP_WIDTH = grp
        for tap, name, bytes_ in ((jnp.bfloat16, "bf16", 2),
                                  (jnp.uint8, "u8", 1)):
            dt = run(tap)
            rows = b * s * h * w / grp
            print(json.dumps({
                "grp": grp, "row_lanes": grp * 16, "tap": name,
                "ms": round(dt * 1e3, 3),
                "Mrows_s": round(rows / dt / 1e6, 1),
                "GB_s": round(rows * grp * 16 * bytes_ / dt / 1e9, 1),
            }))
    sampling._GROUP_WIDTH = 8


if __name__ == "__main__":
    main()
