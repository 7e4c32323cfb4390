"""Profiling / timing helpers.

The reference's observability is wall-clock deltas around control calls
(``quadrotor_gp_mpc/main.py:94,169-186``; ``MPCMetrics`` solve-time stats)
— meaningless inside a fused device loop. The TPU equivalents:

* ``trace`` — context manager around ``jax.profiler`` for real traces;
* ``device_timeit`` — amortised per-call latency of a jitted function,
  syncing through a **host value transfer**: over remote-TPU tunnels
  ``block_until_ready`` can return before execution finishes, so a scalar
  fetch is the only reliable fence (measured in this project; see
  bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/uav_tpu_trace"):
    """``with trace(): ...`` — writes a TensorBoard-viewable device trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf).ravel()[:1]  # host transfer == reliable device fence


def device_timeit(
    fn: Callable,
    *args,
    reps: int = 3,
    perturb: Callable | None = None,
    **kwargs,
) -> float:
    """Best-of-``reps`` wall time of ``fn(*args)`` with device sync.

    ``perturb(rep, args) -> args`` varies the inputs per rep (defeats
    execution memoisation in record/replay tunnels).
    """
    out = fn(*args, **kwargs)
    _sync(out)  # compile + warm

    best = float("inf")
    for rep in range(reps):
        call_args = perturb(rep, args) if perturb is not None else args
        t0 = time.perf_counter()
        out = fn(*call_args, **kwargs)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best
