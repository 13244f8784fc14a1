"""Environment helpers (seed control, device info).

Parity with `mono/apis/env.py:61-77` minus the CUDA specifics; JAX RNG is
explicit (keys are passed through the train step), so this seeds only the
host-side generators the data pipeline uses.
"""

from __future__ import annotations

import random

import numpy as np


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def device_summary() -> str:
    import jax

    ds = jax.devices()
    return f"{len(ds)} device(s): {[str(d) for d in ds]}, " \
           f"process {jax.process_index()}/{jax.process_count()}"
