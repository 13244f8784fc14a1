"""Environment helpers (seed control, device info).

Parity with `mono/apis/env.py:61-77` minus the CUDA specifics; JAX RNG is
explicit (keys are passed through the train step), so this seeds only the
host-side generators the data pipeline uses.
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Persistent XLA compile cache for every CLI entry point.

    The flagship step compiles in minutes (remote-compile tunnel on TPU,
    single-core host on CPU); re-runs of train/eval/acceptance tools must
    not pay that twice. Default location: `<repo>/.jax_cache` (shared with
    the test suite and bench.py), overridable via $JPERCEIVER_CACHE_DIR.
    """
    import jax

    cache_dir = (cache_dir or os.environ.get("JPERCEIVER_CACHE_DIR")
                 or os.path.join(os.path.dirname(os.path.dirname(
                     os.path.dirname(os.path.abspath(__file__)))),
                     ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    return cache_dir


def device_summary() -> str:
    import jax

    ds = jax.devices()
    return f"{len(ds)} device(s): {[str(d) for d in ds]}, " \
           f"process {jax.process_index()}/{jax.process_count()}"
