"""Device mesh & sharding helpers — the distributed layer.

The reference's entire parallelism strategy is data parallelism over NCCL:
one process per GPU, DDP gradient allreduce (`trainer.py:146-235`,
`dist_utils.py:12-60`). The TPU-native equivalent is declarative: build a
`Mesh` over the chips, shard the batch dimension with `NamedSharding`, and
let sharded autodiff emit the gradient `psum` over ICI inside the single
jitted train step. No wrapper module, no manual bucketing, no pickle-file
eval gather.

The model here is a ~50M-param CNN — weights replicate (pure DP). The mesh
still carries a second `model` axis so larger variants can shard params
(FSDP-style) by passing `model_axis > 1`; shardings are chosen so all
collectives ride ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, model_axis: int = 1) -> Mesh:
    """1-D data mesh by default; (data, model) when model_axis > 1."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_axis:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for array batches."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, process_local: bool | None = None):
    """Place every array in the batch with its leading dim over `data`.

    Single-process: a plain device_put of the global batch. Multi-process:
    each host's loader yields only its rank-strided shard
    (`data/loader.py`), so the global array is assembled with
    `make_array_from_process_local_data` — a device_put of the local batch
    against the global sharding would misinterpret it as the global batch.
    """
    sharding = data_sharding(mesh)
    if process_local is None:
        process_local = jax.process_count() > 1
    if process_local:
        import numpy as _np

        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, _np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def zero1_state_shardings(mesh: Mesh, state, axis: str = "model"):
    """ZeRO-1 shardings for a TrainState: optimizer moments sharded.

    Params and batch stats stay replicated (they are read by every chip's
    forward), while each Adam moment leaf is sharded along its largest
    dimension divisible by the mesh `axis` size — the update then runs on
    1/axis_size of the moment state per chip and XLA all-gathers only the
    parameter delta over ICI. The reference has no analogue (DDP replicates
    optimizer state per GPU, `mmcv.runner` + torch Adam).

    Returns a pytree of NamedShardings matching `state`'s structure.
    """
    n_shard = mesh.shape[axis]
    repl = NamedSharding(mesh, P())

    def moment_sharding(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return repl
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % n_shard == 0 and x.shape[d] >= n_shard:
                spec = [None] * x.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return repl

    def _entry_name(p):
        for attr in ("name", "key", "idx"):
            if hasattr(p, attr):
                return str(getattr(p, attr))
        return str(p)

    def leaf_sharding(path, x):
        names = [_entry_name(p) for p in path]
        if "opt_state" in names and ("mu" in names or "nu" in names):
            return moment_sharding(x)
        return repl

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)
