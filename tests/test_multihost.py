"""REAL 2-process multihost test on the CPU backend.

Validates the distributed mechanics the reference exercises with NCCL DDP
(`env.py:30-38`, `dist_utils.py:12-60`, `eval_hooks.py:244-262`):

  * `jax.distributed.initialize` over a local coordinator,
  * a global (2 hosts x 4 devices) mesh from `make_mesh`,
  * `shard_batch` assembling a GLOBAL array from per-process loader shards
    (`make_array_from_process_local_data` — a plain device_put of the local
    batch would silently mis-shard, the bug this test pins down),
  * a sharded jitted reduction whose psum spans both processes,
  * `process_allgather` aggregation (the eval-hook path),
  * rank-strided loader sharding covering every sample exactly once.

Each subprocess re-executes this file with a process id; results are
asserted inside the workers (non-zero exit on failure).
"""

import os
import socket
import subprocess
import sys

import pytest


N_PROC = 2
LOCAL_DEVICES = 4


def _worker(pid: int, coordinator: str) -> None:
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=N_PROC,
        process_id=pid,
    )
    import numpy as np

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jperceiver_tpu.parallel import make_mesh, shard_batch

    assert jax.process_count() == N_PROC
    assert jax.device_count() == N_PROC * LOCAL_DEVICES
    mesh = make_mesh()

    # --- global batch from per-process shards -----------------------------
    # Global batch: rows 0..7 with value = row index; host p holds the
    # rank-strided shard the DataLoader would give it.
    global_rows = np.arange(8, dtype=np.float32).reshape(8, 1) * np.ones((8, 4), np.float32)
    local = global_rows[pid * LOCAL_DEVICES : (pid + 1) * LOCAL_DEVICES]
    batch = shard_batch(mesh, {"x": local})
    assert batch["x"].shape == (8, 4), batch["x"].shape

    @jax.jit
    def global_mean(b):
        return jnp.mean(b["x"])

    got = float(global_mean(batch))
    expected = float(global_rows.mean())  # 3.5
    assert abs(got - expected) < 1e-6, (got, expected)

    # --- eval-hook style allgather -----------------------------------------
    from jax.experimental import multihost_utils

    contrib = np.asarray([float(pid + 1), 2.0 * (pid + 1)])
    gathered = multihost_utils.process_allgather(contrib)
    assert gathered.shape == (N_PROC, 2)
    np.testing.assert_allclose(gathered[:, 0], [1.0, 2.0])

    # --- loader rank-striding covers each sample exactly once ---------------
    from jperceiver_tpu.data.loader import DataLoader

    class Idx:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"i": np.asarray([i], np.int64)}

    loader = DataLoader(Idx(), batch_size=2, shuffle=False, num_workers=1,
                        process_index=pid, process_count=N_PROC,
                        drop_last=False)
    seen = []
    for b in loader:
        valid = b.get("_valid", np.ones(len(b["i"]), bool))
        seen += [int(v[0]) for v, ok in zip(b["i"], valid) if ok]
    all_seen = multihost_utils.process_allgather(
        np.asarray(sorted(seen) + [-1] * (10 - len(seen))))
    union = sorted(int(v) for v in np.asarray(all_seen).ravel() if v >= 0)
    assert union == list(range(10)), union

    print(f"proc {pid} OK")


def test_two_process_cpu_multihost(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
        )
        code = (
            "import sys, jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})\n"
            "from test_multihost import _worker\n"
            f"_worker({pid}, {coordinator!r})\n"
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"proc {pid} OK" in out
