"""Can a 3x3 conv beat XLA's conv lowering via explicit MXU matmuls?"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=10):
    fn(*args)
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    B, H, W, C, O = 1, 256, 256, 256, 256
    flops = 2 * B * H * W * C * O * 9

    x = jnp.ones((B, H, W, C), jnp.bfloat16)
    k = jnp.ones((3, 3, C, O), jnp.bfloat16)

    conv = jax.jit(lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32))
    print(json.dumps({"probe": "xla_conv", "tflops":
                      round(flops / timeit(conv, x, k) / 1e12, 2)}), flush=True)

    def shifted_matmul(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((B, H, W, O), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                patch = xp[:, dy:dy + H, dx:dx + W, :].reshape(B * H * W, C)
                acc += jnp.dot(patch, k[dy, dx],
                               preferred_element_type=jnp.float32
                               ).reshape(B, H, W, O)
        return acc

    f = jax.jit(shifted_matmul)
    print(json.dumps({"probe": "shifted_matmul", "tflops":
                      round(flops / timeit(f, x, k) / 1e12, 2)}), flush=True)

    # im2col: one big matmul (9C contraction)
    def im2col(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [xp[:, dy:dy + H, dx:dx + W, :] for dy in range(3) for dx in range(3)],
            axis=-1).reshape(B * H * W, 9 * C)
        return jnp.dot(cols, k.reshape(9 * C, O),
                       preferred_element_type=jnp.float32).reshape(B, H, W, O)

    f2 = jax.jit(im2col)
    print(json.dumps({"probe": "im2col_matmul", "tflops":
                      round(flops / timeit(f2, x, k) / 1e12, 2)}), flush=True)

    # depth-decoder-realistic: 513ch -> 256 at 256^2 (iconv3 shape)
    x2 = jnp.ones((1, 256, 256, 513), jnp.bfloat16)
    k2 = jnp.ones((3, 3, 513, 256), jnp.bfloat16)
    fl2 = 2 * 256 * 256 * 513 * 256 * 9
    print(json.dumps({"probe": "xla_conv_513to256", "tflops":
                      round(fl2 / timeit(conv, x2, k2) / 1e12, 2)}), flush=True)

    # does spatial size change efficiency?
    x3 = jnp.ones((1, 512, 512, 64), jnp.bfloat16)
    k3 = jnp.ones((3, 3, 64, 64), jnp.bfloat16)
    fl3 = 2 * 512 * 512 * 64 * 64 * 9
    print(json.dumps({"probe": "xla_conv_64ch_512sq", "tflops":
                      round(fl3 / timeit(conv, x3, k3) / 1e12, 2)}), flush=True)


if __name__ == "__main__":
    main()
