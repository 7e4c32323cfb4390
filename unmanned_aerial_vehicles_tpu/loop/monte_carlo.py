"""Monte-Carlo robustness evaluation: batched flights under randomized
plants, winds and initial conditions.

The reference evaluates each controller on ONE nominal plant per campaign
run (PX4 SITL with fixed parameters; the standalone harness's fixed-seed
comparison at ``/root/reference/quadrotor_gp_mpc/quadrotor_gp_mpc/main.py:417-541``).
It has no dispersion analysis — robustness is argued from a handful of bags.
On TPU a population IS one program: ``vmap`` over a pytree batch of
``RigidBodyParams`` / ``RateLoopParams`` (mass, drag, rate-loop lags,
hover-thrust calibration), steady wind vectors (``RigidBodyParams.wind``)
and jittered initial states turns a single flight rollout into an N-flight
Monte-Carlo study whose wall-clock is one batched rollout — the batch axis
shards over a device mesh exactly like ``parallel.sweep``.

Outputs use the campaign's own metric formulas (RMS / max position error,
``metrics.tracking``) plus dispersion statistics the reference cannot
produce: success rate (finite, no fly-away), error quantiles across the
population, and worst-case excursion.
"""

from __future__ import annotations

from typing import Callable

from flax import struct
import jax
import jax.numpy as jnp

from ..control.cascade_pid import CascadePidGains
from ..models.params import RigidBodyParams
from ..models.px4_surrogate import RateLoopParams
from .closed_loop import (
    FlightLoopConfig,
    mpc_flight_rollout,
    pid_flight_rollout,
)


@struct.dataclass
class MonteCarloConfig:
    """Dispersion model. Multiplicative jitters are log-normal
    (``param * exp(pct * N(0,1))``) so physical positivity is preserved;
    wind is additive Gaussian per world axis; initial state is jittered
    around the nominal start."""

    n_rollouts: int = 256
    seed: int = 0
    mass_jitter_pct: float = 0.10
    drag_jitter_pct: float = 0.30
    tau_jitter_pct: float = 0.20
    hover_thrust_jitter_pct: float = 0.03
    wind_std: float = 0.8            # m/s, steady world-frame wind per axis
    initial_pos_std: float = 0.3     # m
    initial_vel_std: float = 0.1     # m/s
    # metric window / crash classification
    settle_steps: int = 250          # ticks excluded from RMS (takeoff ramp)
    crash_error_m: float = 10.0      # max |pos err| beyond which a run "crashed"


def sample_conditions(
    key: jax.Array,
    mc: MonteCarloConfig,
    body: RigidBodyParams = RigidBodyParams(),
    rate_loop: RateLoopParams = RateLoopParams(),
    takeoff_height: float = 3.0,
):
    """Draw ``n_rollouts`` (bodies, rate_loops, initial_states).

    Returns pytrees whose leaves carry a leading batch axis — feed them to
    ``vmap``-ed rollouts (or shard the axis over a mesh)."""
    n = mc.n_rollouts
    keys = jax.random.split(key, 8)
    logn = lambda k, pct, shape=(n,): jnp.exp(
        pct * jax.random.normal(k, shape, jnp.float32)
    )

    mass = body.mass * logn(keys[0], mc.mass_jitter_pct)
    kdl = body.k_drag_linear * logn(keys[1], mc.drag_jitter_pct)
    kda = body.k_drag_angular * logn(keys[2], mc.drag_jitter_pct)
    wind = mc.wind_std * jax.random.normal(keys[3], (n, 3), jnp.float32)
    bodies = jax.vmap(
        lambda m, kl, ka, w: body.replace(
            mass=m, k_drag_linear=kl, k_drag_angular=ka,
            wind=(w[0], w[1], w[2]),
        )
    )(mass, kdl, kda, wind)

    taus = logn(keys[4], mc.tau_jitter_pct, (n, 3))
    hover = rate_loop.hover_thrust_norm * logn(
        keys[5], mc.hover_thrust_jitter_pct
    )
    rate_loops = jax.vmap(
        lambda t, h: rate_loop.replace(
            tau_roll=rate_loop.tau_roll * t[0],
            tau_pitch=rate_loop.tau_pitch * t[1],
            tau_yaw=rate_loop.tau_yaw * t[2],
            hover_thrust_norm=h,
        )
    )(taus, hover)

    x0 = jnp.zeros((n, 12), jnp.float32).at[:, 2].set(takeoff_height)
    x0 = x0.at[:, 0:3].add(
        mc.initial_pos_std * jax.random.normal(keys[6], (n, 3), jnp.float32)
    )
    x0 = x0.at[:, 3:6].add(
        mc.initial_vel_std * jax.random.normal(keys[7], (n, 3), jnp.float32)
    )
    return bodies, rate_loops, x0


def robustness_stats(
    positions: jnp.ndarray,     # (B, T, 3)
    pos_ref: jnp.ndarray,       # (T, 3)
    settle_steps: int,
    crash_error_m: float,
) -> dict:
    """Population dispersion statistics (in-graph)."""
    err = jnp.linalg.norm(positions - pos_ref[None, :, :], axis=-1)  # (B, T)
    window = err[:, settle_steps:]
    rms = jnp.sqrt(jnp.mean(window**2, axis=1))
    max_err = jnp.max(err, axis=1)
    finite = jnp.isfinite(positions).all(axis=(1, 2))
    success = finite & (max_err < crash_error_m)

    rms_ok = jnp.where(success, rms, jnp.nan)
    pct = lambda q: jnp.nanpercentile(rms_ok, q)
    return {
        "rms_pos": rms,
        "max_pos": max_err,
        "success": success,
        "success_rate": jnp.mean(success.astype(jnp.float32)),
        "rms_mean": jnp.nanmean(rms_ok),
        "rms_p50": pct(50.0),
        "rms_p90": pct(90.0),
        "rms_p99": pct(99.0),
        "worst_max_pos": jnp.max(jnp.where(finite, max_err, jnp.inf)),
    }


def monte_carlo_flights(
    flight_fn: Callable,
    reference_fn: Callable,
    num_steps: int,
    mc: MonteCarloConfig = MonteCarloConfig(),
    body: RigidBodyParams = RigidBodyParams(),
    rate_loop: RateLoopParams = RateLoopParams(),
    loop_cfg: FlightLoopConfig = FlightLoopConfig(),
) -> dict:
    """Generic engine: ``flight_fn(body_i, rate_loop_i, x0_i) -> state (T,12)``
    is vmapped over sampled conditions; returns ``robustness_stats``.

    Works on every execution tier: the fused Pallas kernels take the plant
    scalars (mass/drag/rate-lags/hover-thrust/wind) as TRACED row operands,
    so ``vmap`` over the dispersion batch adds a kernel grid axis instead of
    forcing per-sample recompiles — ``loop_cfg.use_fused_tick=True`` runs
    the whole population study on the latency path. Set
    ``loop_cfg.fallback_error_m`` (e.g. 5.0) to bound worst-case excursions
    with the reference's divergence-triggered hover fallback
    (``src/px4/mpc.py:2276-2282``)."""
    key = jax.random.PRNGKey(mc.seed)
    bodies, rate_loops, x0 = sample_conditions(
        key, mc, body, rate_loop, loop_cfg.takeoff_height
    )
    states = jax.vmap(flight_fn)(bodies, rate_loops, x0)   # (B, T, 12)

    ts = jnp.arange(num_steps, dtype=jnp.float32) * loop_cfg.control_dt
    pos_ref, _ = jax.vmap(reference_fn)(ts)
    return robustness_stats(
        states[:, :, 0:3], jnp.asarray(pos_ref, jnp.float32),
        mc.settle_steps, mc.crash_error_m,
    )


def monte_carlo_pid(
    reference_fn: Callable,
    num_steps: int,
    mc: MonteCarloConfig = MonteCarloConfig(),
    gains: CascadePidGains | None = None,
    body: RigidBodyParams = RigidBodyParams(),
    rate_loop: RateLoopParams = RateLoopParams(),
    loop_cfg: FlightLoopConfig = FlightLoopConfig(),
) -> dict:
    """Cascade-PID population study."""

    def flight(b, r, x0):
        return pid_flight_rollout(
            reference_fn, num_steps, gains=gains, body=b, rate_loop=r,
            cfg=loop_cfg, initial_state=x0,
        )["state"]

    return monte_carlo_flights(
        flight, reference_fn, num_steps, mc, body, rate_loop, loop_cfg
    )


def monte_carlo_mpc(
    mpc,
    reference_fn: Callable,
    num_steps: int,
    mc: MonteCarloConfig = MonteCarloConfig(),
    residual_fn: Callable | None = None,
    preview: bool = False,
    body: RigidBodyParams = RigidBodyParams(),
    rate_loop: RateLoopParams = RateLoopParams(),
    loop_cfg: FlightLoopConfig = FlightLoopConfig(),
) -> dict:
    """(GP-)MPC population study — any execution tier (the fused kernels
    consume traced plant rows, so the XLA, pallas-plant and fused-tick
    paths all vmap over the dispersion batch)."""

    def flight(b, r, x0):
        return mpc_flight_rollout(
            mpc, reference_fn, num_steps, body=b, rate_loop=r, cfg=loop_cfg,
            initial_state=x0, residual_fn=residual_fn, preview=preview,
        )["state"]

    return monte_carlo_flights(
        flight, reference_fn, num_steps, mc, body, rate_loop, loop_cfg
    )
