"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding paths are
validated without TPU hardware) with x64 enabled so parity checks against the
reference's float64 NumPy/sklearn numerics can hold to 1e-6 and tighter.

Backend note: the interactive environment loads an ``axon`` TPU-tunnel
sitecustomize which imports jax at interpreter start with
``JAX_PLATFORMS=axon`` — freezing that choice before this conftest runs.
Merely setting ``os.environ`` here is too late; ``jax.config.update``
overrides the already-read value. Without this, the whole suite silently
runs over the remote TPU tunnel: ~20x slower and with remote-XLA numerics
that break 1e-9 parity assertions.
"""

import os

# XLA flags are read at first backend initialisation, which has not happened
# yet even though jax may already be imported (by the sitecustomize).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: CPU jit compiles dominate suite wall-time on
# small boxes (this one has a single core — prefer plain `pytest` over
# xdist here; -n N multiplies the compile work N-fold for no parallelism).
# First run populates .jax_cache_cpu; warm reruns skip the compiles.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
