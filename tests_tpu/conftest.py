"""Real-TPU test configuration (VERDICT round-3 missing #3).

Unlike ``tests/`` (which pins the CPU backend and runs the Pallas kernels
in interpreter mode), everything under ``tests_tpu/`` runs the kernels
through the REAL Mosaic compiler on the chip — the layer where relayout
rules, precision behaviour and VMEM pressure can regress without any CPU
test noticing.

Run explicitly (``pytest.ini``'s ``testpaths = tests`` keeps this directory
out of the default CI suite):

    python -m pytest tests_tpu/ -q

Tests auto-skip when no TPU backend is available, so the command is safe
anywhere. Uses the shared compilation cache — a warm rerun takes seconds.
"""

import jax
import pytest

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        marker = pytest.mark.skip(reason="no TPU backend available")
        for item in items:
            item.add_marker(marker)
