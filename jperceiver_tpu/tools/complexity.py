"""Model complexity report: params + FLOPs per submodule.

Replaces the reference's thop-instrumented model copy
(`mono/model/mono_baseline/net_testcomplexity.py:76-86`) with XLA's own
cost analysis: each submodule's forward is lowered and compiled, and the
compiler reports exact FLOPs — no third-party profiler, no duplicate model.

  python -m jperceiver_tpu.tools.complexity [--height 1024] [--width 1024]
"""

from __future__ import annotations

import argparse


def _count_params(tree) -> int:
    import jax

    return sum(p.size for p in jax.tree_util.tree_leaves(tree))


def _flops(fn, *args) -> float:
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    return float(ca.get("flops", float("nan")))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--depth_layers", type=int, default=18)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data import synthetic_batch
    from ..models import JPerceiver

    h, w, b = args.height, args.width, args.batch
    occ = h // 4
    model = JPerceiver(depth_layers=args.depth_layers, height=h, width=w,
                       occ_map_size=occ)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(b, h, w, occ).items()}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=True,
    )
    params = variables["params"]

    rows = []
    total = _count_params(params)
    for name, sub in sorted(params.items()):
        rows.append((name, _count_params(sub)))

    def fwd(v, batch):
        return model.apply(v, batch, train=False, with_pose=True)

    v = {"params": params, "batch_stats": variables["batch_stats"]}
    total_flops = _flops(fwd, v, batch)

    print(f"{'submodule':<28}{'params':>14}{'params %':>10}")
    for name, n in sorted(rows, key=lambda r: -r[1]):
        print(f"{name:<28}{n:>14,}{100 * n / total:>9.1f}%")
    print(f"{'TOTAL':<28}{total:>14,}")
    print(f"\nforward FLOPs @ {b}x{h}x{w}: {total_flops / 1e9:.2f} GFLOP "
          f"({total_flops / b / 1e9:.2f} per frame)")
    return total, total_flops


if __name__ == "__main__":
    main()
