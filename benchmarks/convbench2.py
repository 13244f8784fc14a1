"""Why is the 64-channel conv at 3.4 TF/s? Variant sweep."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))

def timeit(fn, *args, iters=10):
    fn(*args); sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters

def main():
    import jax, jax.numpy as jnp
    conv = lambda dn: jax.jit(lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32))

    cases = [
        ("nhwc_b1_512sq_64ch", (1, 512, 512, 64), (3, 3, 64, 64), ("NHWC", "HWIO", "NHWC")),
        ("nhwc_b4_256sq_64ch", (4, 256, 256, 64), (3, 3, 64, 64), ("NHWC", "HWIO", "NHWC")),
        ("nchw_b1_512sq_64ch", (1, 64, 512, 512), (64, 64, 3, 3), ("NCHW", "OIHW", "NCHW")),
        ("nhwc_b1_512sq_64to128", (1, 512, 512, 64), (3, 3, 64, 128), ("NHWC", "HWIO", "NHWC")),
        ("nhwc_b1_512sq_128ch", (1, 512, 512, 128), (3, 3, 128, 128), ("NHWC", "HWIO", "NHWC")),
        ("nhwc_b1_1024sq_64ch", (1, 1024, 1024, 64), (3, 3, 64, 64), ("NHWC", "HWIO", "NHWC")),
        ("nhwc_b1_512sq_64ch_s2", (1, 512, 512, 64), (3, 3, 64, 64), ("NHWC", "HWIO", "NHWC")),
    ]
    for name, xs, ks, dn in cases:
        x = jnp.ones(xs, jnp.bfloat16); k = jnp.ones(ks, jnp.bfloat16)
        strides = (2, 2) if name.endswith("_s2") else (1, 1)
        f = jax.jit(lambda x, k, s=strides, d=dn: jax.lax.conv_general_dilated(
            x, k, s, "SAME", dimension_numbers=d, preferred_element_type=jnp.float32))
        dt = timeit(f, x, k)
        hw = xs[1] * xs[2] if dn[0] == "NHWC" else xs[2] * xs[3]
        cin = xs[3] if dn[0] == "NHWC" else xs[1]
        cout = ks[3] if dn[1] == "HWIO" else ks[0]
        div = 4 if name.endswith("_s2") else 1
        flops = 2 * xs[0] * hw // div * cin * cout * 9
        print(json.dumps({"probe": name, "ms": round(dt*1e3, 2),
                          "tflops": round(flops / dt / 1e12, 2)}), flush=True)

if __name__ == "__main__":
    main()
