"""Workload scaling for the runnable examples.

The reference ships an executable-script culture (SURVEY section 4.2) but
never executes those scripts in CI. Here ``examples/01-15`` are covered by
a parametrised smoke test (``tests/test_examples.py``) that runs each one
headless with ``UAV_FAST_EXAMPLES=1``; the examples route their workload
sizes through :func:`scaled` so the smoke run finishes in CI time while the
default invocation keeps the full, documentation-grade workload.
"""

from __future__ import annotations

import os

__all__ = ["fast_examples", "scaled"]


def fast_examples() -> bool:
    """True when ``UAV_FAST_EXAMPLES`` is set (CI smoke mode)."""
    return bool(os.environ.get("UAV_FAST_EXAMPLES"))


def scaled(full, fast):
    """``full`` normally; ``fast`` under ``UAV_FAST_EXAMPLES=1``."""
    return fast if fast_examples() else full
