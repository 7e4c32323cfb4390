"""Sharded batch sweeps: the framework's multi-chip "training step".

BASELINE.json config 5 asks for GP-MPC closed loops "vmapped over 1k
trajectory/hyperparameter batches" on a device mesh. Two sweeps:

* ``sharded_flight_sweep`` — B closed-loop flights (different initial states)
  vmapped and sharded over the mesh batch axis; per-flight tracking metrics
  come back sharded, the cross-flight aggregates force an ICI all-reduce.
* ``hyperparameter_search_step`` — the GP "training step": H candidate
  hyperparameter settings fitted and scored (validation MSE + LML) in
  parallel across the mesh, then a global argmin picks the winner —
  a sharded-axis reduction XLA lowers to collectives. This is the
  mesh-parallel generalisation of the reference's sequential SciPy
  hyperparameter search (``gaussian_process.py:267-324``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..gp.exact_gp import GPParams, fit_gp, log_marginal_likelihood, predict_mean
from .sharding import replicated_sharding, shard_batch


class SweepResult(NamedTuple):
    best_index: jnp.ndarray
    best_params: GPParams
    val_mse: jnp.ndarray      # (H,)
    lml: jnp.ndarray          # (H,)


def hyperparameter_search_step(
    mesh,
    candidates: GPParams,          # leaves with leading axis H
    X_train: jnp.ndarray,
    Y_train: jnp.ndarray,
    X_val: jnp.ndarray,
    Y_val: jnp.ndarray,
    jitter: float = 1e-4,
    axis_name: str = "batch",
):
    """Fit + score H candidates across the mesh; returns the argmin winner."""
    cand_sharded = jax.tree_util.tree_map(
        lambda a: shard_batch(a, mesh, axis_name), candidates
    )
    repl = replicated_sharding(mesh)
    X_train, Y_train, X_val, Y_val = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, repl), (X_train, Y_train, X_val, Y_val)
    )

    def score_one(p: GPParams):
        post = fit_gp(p, X_train, Y_train, jitter=jitter, normalize_y=True)
        pred = predict_mean(post, X_val)
        mse = jnp.mean((pred - Y_val) ** 2)
        lml = log_marginal_likelihood(p, X_train, Y_train, jitter, normalize_y=True)
        return mse, lml

    @jax.jit
    def run(cands):
        mse, lml = jax.vmap(score_one)(cands)
        best = jnp.argmin(mse)  # sharded-axis reduction -> ICI all-reduce
        best_params = jax.tree_util.tree_map(lambda a: a[best], cands)
        return SweepResult(best, best_params, mse, lml)

    return run(cand_sharded)


def sharded_flight_sweep(
    mesh,
    rollout_fn: Callable[[jnp.ndarray], dict],
    initial_states: jnp.ndarray,   # (B, 12)
    axis_name: str = "batch",
):
    """Run B independent closed-loop flights sharded across the mesh.

    ``rollout_fn(initial_state) -> outs dict`` (e.g. a partial of
    ``loop.mpc_flight_rollout``). Returns per-flight RMS position errors
    (sharded) plus their global mean/max (ICI all-reduce).
    """
    states = shard_batch(initial_states, mesh, axis_name)

    @jax.jit
    def run(s):
        outs = jax.vmap(rollout_fn)(s)
        err = outs["pos_ref"] - outs["state"][..., 0:3]
        rms = jnp.sqrt(jnp.mean(jnp.sum(err**2, axis=-1), axis=-1))  # (B,)
        return {
            "rms_per_flight": rms,
            "rms_mean": jnp.mean(rms),
            "rms_max": jnp.max(rms),
            "final_states": outs["final_state"],
        }

    return run(states)


def sharded_structured_flight_sweep(
    mesh,
    mpc,
    reference_fn: Callable,
    num_steps: int,
    initial_states: jnp.ndarray,   # (B, 12)
    cfg=None,
    residual_fn: Callable | None = None,
    axis_name: str = "batch",
    gp_posterior=None,
    gp_cfg=None,
    gp_fused_precision: str = "high",
):
    """B flights through the STRUCTURED batched controller kernel, sharded
    over the mesh: each device runs its local flight block through
    ``loop.closed_loop.batched_mpc_flight_sweep`` (one gridded Pallas
    dispatch per tick, iterates VMEM-resident), and the cross-flight RMS
    aggregates reduce over ICI. This is the multi-chip form of the
    throughput mode — kernels inside ``jax.shard_map``.

    ``gp_posterior`` routes the GP stage through the fused limb-packed
    Pallas posterior-mean kernel on every device (replicated posterior,
    sharded flights) — see ``batched_mpc_flight_sweep``.

    ``mpc`` must be built with ``use_fused_controller=True``. Flights
    per device are padded up to the kernel block internally, so prefer
    ``B >= 128 * mesh size`` for efficiency. Returns the same aggregate
    dict as ``sharded_flight_sweep``.
    """
    import functools

    from jax.sharding import PartitionSpec as P

    from ..loop.closed_loop import FlightLoopConfig, batched_mpc_flight_sweep

    if cfg is None:
        cfg = FlightLoopConfig()

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P(axis_name),
        out_specs={
            "rms_per_flight": P(axis_name),
            "rms_mean": P(),
            "rms_max": P(),
        },
        check_vma=False,   # pallas_call inside shard_map
    )
    def run(local_starts):
        outs = batched_mpc_flight_sweep(
            mpc, reference_fn, num_steps, local_starts, cfg=cfg,
            residual_fn=residual_fn, gp_posterior=gp_posterior,
            gp_cfg=gp_cfg, gp_fused_precision=gp_fused_precision,
        )
        err = outs["pos_ref"][:, None, :] - outs["state"][:, :, 0:3]
        rms = jnp.sqrt(jnp.mean(jnp.sum(err**2, axis=-1), axis=0))  # (B_loc,)
        return {
            "rms_per_flight": rms,
            "rms_mean": jax.lax.pmean(jnp.mean(rms), axis_name),
            "rms_max": jax.lax.pmax(jnp.max(rms), axis_name),
        }

    return jax.jit(run)(shard_batch(initial_states, mesh, axis_name))
