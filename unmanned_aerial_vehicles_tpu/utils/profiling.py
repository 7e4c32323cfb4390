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


def scan_slope_timeit(
    make_fn: Callable,
    short: int,
    long: int,
    *args,
    reps: int = 3,
    perturb: Callable | None = None,
) -> dict:
    """Per-iteration cost of a scan-shaped program by LENGTH DIFFERENCING.

    A single timed dispatch includes a fixed host->device round-trip (tens
    of ms over remote-TPU tunnels) that masquerades as per-iteration cost
    when divided by the scan length. Timing the same program at two lengths
    and taking the slope ``(t_long - t_short) / (long - short)`` cancels the
    fixed cost exactly (bench.py's headline methodology).

    ``make_fn(T) -> fn(*args)`` builds the T-iteration program. Returns
    ``{"per_iter_s", "fixed_overhead_s", "t_short_s", "t_long_s"}``.
    """
    t_short = device_timeit(make_fn(short), *args, reps=reps, perturb=perturb)
    t_long = device_timeit(make_fn(long), *args, reps=reps, perturb=perturb)
    per_iter = (t_long - t_short) / (long - short)
    return {
        "per_iter_s": per_iter,
        "fixed_overhead_s": t_short - per_iter * short,
        "t_short_s": t_short,
        "t_long_s": t_long,
    }
