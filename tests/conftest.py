"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated the way the driver does it — with
`--xla_force_host_platform_device_count` standing in for real chips.
Must run before jax is imported anywhere.
"""

import os

# Force CPU: the ambient environment selects the TPU plugin
# (JAX_PLATFORMS=axon), but the suite needs 8 virtual devices and fp32
# convolutions for golden parity. The site's sitecustomize.py imports jax
# at interpreter start, so the env var is already consumed — update the
# live jax config too (backends are not yet initialized at conftest time).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the slow-marked tests jit the full model on a
# single-core CPU host (minutes per compile); cached re-runs are seconds.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
