#!/usr/bin/env python3
"""End-to-end benchmark: GP-MPC control-step latency on TPU.

Headline metric (BASELINE.json): the fused GP-enhanced MPC control step —
GP horizon posterior (800-point flight GP) + N=20 condensed-QP ADMM solve +
geometric allocation + surrogate plant step — measured per tick of a jitted
closed-loop ``lax.scan``. The reference's implied budget is <20 ms per solve
(50 Hz loop, ``src/px4/mpc.py:1868``; Ipopt caps ``mpc.py:1427-1438``), with
a north-star target of <1 ms on TPU v5e-1.

Latency mode runs 8 WHOLE ticks per Pallas dispatch with the GP posterior
inside the kernel (``ops.tick_pallas.gpmpc_multitick_fused``: GP GEMMs +
warm-start shift + ADMM + allocation + plant, bf16 ADMM recursion with f32
setup/refresh) — per-dispatch overhead and static-matrix VMEM loads
amortise 8x. Throughput mode runs 1024 concurrent flights through the
structured batched controller kernel (``ops.controller_pallas``).

Measurement: per-tick cost is the SLOPE between two scan lengths,
``(t(10000) - t(2000)) / 8000`` — a single timed call includes a fixed
~30 ms host->TPU dispatch round-trip (tunnel RPC), which at 2000 ticks
masquerades as ~15 us/tick of fake per-tick cost (this was round 1's
"scan floor"). The slope cancels it exactly; the dispatch overhead is
reported separately.

Prints ONE JSON line:
  value        = microseconds per control tick (lower is better)
  vs_baseline  = value / 20000 us  (fraction of the reference's real-time
                 budget; <1 means faster than the reference's CPU loop)

Timing notes: ticks are chained (data-dependent) inside one on-device scan,
so per-tick cost includes no host round-trips; reps use different initial
states to defeat any execution memoization in remote-TPU tunnels.
"""

import glob
import json
import os
import time

import jax

# Persistent compile cache: first compile of the fused rollout can take
# minutes over a remote-TPU tunnel; later bench runs reuse it.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from unmanned_aerial_vehicles_tpu.control.mpc_linear import LinearMPC, LinearMPCConfig
from unmanned_aerial_vehicles_tpu.gp import build_horizon_residuals, fit_residual_gp
from unmanned_aerial_vehicles_tpu.gp.residual_gp import ResidualGPConfig
from unmanned_aerial_vehicles_tpu.io import load_gp_datasets
from unmanned_aerial_vehicles_tpu.loop import FlightLoopConfig, mpc_flight_rollout
from unmanned_aerial_vehicles_tpu.loop.closed_loop import batched_mpc_flight_sweep
from unmanned_aerial_vehicles_tpu.trajectories import ramped_figure8_reference

BASELINE_US = 20_000.0  # reference CPU solve budget (BASELINE.md)
T_SHORT, T_LONG = 2000, 10000
HORIZON = 20            # BASELINE.json: "GP posterior + N=20 QP"
GP_POINTS = 800         # flight config max_data_points (src/px4/mpc.py:1319)
ADMM_ITERS = 10         # closed-loop RMS is iteration-invariant from 10 up
# (measured on v5e: iters 10/12/16/20 -> fig-8 RMS 1.0739/1.0738/1.0738/
# 1.0738, preview RMS 0.1728 at 10; the 50 Hz warm start carries
# convergence across ticks. Solver-parity work uses polish mode instead.)


def load_training_data():
    paths = sorted(glob.glob("/root/reference/gp_datasets/*.csv"))
    if paths:
        X, Y = load_gp_datasets(paths[:6], max_samples=GP_POINTS)
        if X.shape[0] >= 64:
            return X, Y
    rng = np.random.default_rng(0)  # synthetic fallback (no reference mount)
    X = rng.normal(size=(GP_POINTS, 10))
    Y = 0.05 * rng.normal(size=(GP_POINTS, 6))
    return X, Y


def main():
    X, Y = load_training_data()
    Xd = jnp.asarray(X, jnp.float32)
    Yd = jnp.asarray(Y, jnp.float32)

    gp_cfg = ResidualGPConfig()
    # latency mode: 8 whole ticks per Pallas dispatch, GP posterior inside
    # the kernel (ops.tick_pallas.gpmpc_multitick_fused) — amortises the
    # ~6.5 us/tick of dispatch + static-matrix VMEM loads measured on the
    # single-tick kernel (11.36 -> 4.94 us/tick on v5e, same RMS)
    loop_cfg = FlightLoopConfig(
        use_fused_tick=True, fused_tick_loop_precision="default",
        ticks_per_dispatch=8,
    )
    mpc = LinearMPC(
        LinearMPCConfig(horizon=HORIZON, admm_iterations=ADMM_ITERS,
                        use_fused_controller=True)
    )

    def ref(t):
        pos, yaw = ramped_figure8_reference(t, amplitude=6.0, frequency=0.02)
        return pos + jnp.array([0.0, 0.0, loop_cfg.takeoff_height]), yaw

    def make_run(T, preview=False):
        @jax.jit
        def run(Xt, Yt, x0):
            post = fit_residual_gp(Xt, Yt, gp_cfg)
            outs = mpc_flight_rollout(
                mpc, ref, num_steps=T, cfg=loop_cfg,
                gp_posterior=post, gp_gain=gp_cfg.residual_gain,
                initial_state=x0, preview=preview,
            )
            err = outs["pos_ref"] - outs["state"][:, 0:3]
            return jnp.sqrt(jnp.mean(jnp.sum(err**2, axis=-1)))

        return run

    x0_base = jnp.zeros(12).at[2].set(loop_cfg.takeoff_height)

    # Warm-up / compile. NOTE: over remote-TPU tunnels block_until_ready
    # can return before execution completes — a host value transfer
    # (np.asarray / float) is the only reliable synchronisation, so every
    # timed rep fetches a scalar result.
    times = {}
    rms_val = None
    for T in (T_SHORT, T_LONG):
        run = make_run(T)
        r = float(run(Xd, Yd, x0_base))
        if T == T_SHORT:
            rms_val = r
        best = float("inf")
        for rep in range(4):
            x0 = x0_base.at[0].set(0.01 * (rep + 1))  # vary input per rep
            t0 = time.perf_counter()
            rms = run(Xd, Yd, x0)
            float(rms)  # forces device sync
            best = min(best, time.perf_counter() - t0)
        times[T] = best

    per_tick_us = (times[T_LONG] - times[T_SHORT]) / (T_LONG - T_SHORT) * 1e6
    dispatch_ms = (times[T_SHORT] - per_tick_us * 1e-6 * T_SHORT) * 1e3
    rms_preview = float(make_run(T_SHORT, preview=True)(Xd, Yd, x0_base))

    # throughput mode: 1024 concurrent GP-MPC flights (BASELINE config 5)
    # through the structured batched controller kernel
    B, T_b = 1024, 500
    starts = jnp.zeros((B, 12), jnp.float32).at[:, 2].set(loop_cfg.takeoff_height)
    starts = starts.at[:, 0].set(jnp.linspace(-1.0, 1.0, B))

    @jax.jit
    def run_batch(Xt, Yt, ss):
        post = fit_residual_gp(Xt, Yt, gp_cfg)
        rf = lambda Xg, Ug: build_horizon_residuals(post, Xg, Ug, gp_cfg)
        outs = batched_mpc_flight_sweep(
            mpc, ref, T_b, ss, cfg=FlightLoopConfig(), residual_fn=rf
        )
        err = outs["pos_ref"][:, None, :] - outs["state"][:, :, 0:3]
        return jnp.sqrt(jnp.mean(jnp.sum(err**2, axis=-1), axis=0))

    r = run_batch(Xd, Yd, starts)
    float(r[0])  # compile + sync
    best_batch = float("inf")
    for rep in range(3):
        s2 = starts.at[:, 1].set(0.01 * (rep + 1))
        t0 = time.perf_counter()
        r = run_batch(Xd, Yd, s2)
        float(r[0])
        best_batch = min(best_batch, time.perf_counter() - t0)
    batched_us = best_batch / (B * T_b) * 1e6

    print(
        json.dumps(
            {
                "metric": (
                    "GP-MPC control-step latency (GP horizon posterior on "
                    f"{GP_POINTS}-pt flight GP + N={HORIZON} condensed-QP "
                    "ADMM + allocation + plant; 8 whole ticks per Pallas "
                    "dispatch, GP in-kernel; slope-measured)"
                ),
                "value": round(per_tick_us, 2),
                "unit": "us",
                "vs_baseline": round(per_tick_us / BASELINE_US, 6),
                "baseline_us": BASELINE_US,
                "fig8_rms_pos_m": round(rms_val, 4),
                "fig8_rms_pos_m_preview": round(rms_preview, 4),
                "batched_1024_flights_us_per_tick": round(batched_us, 3),
                "dispatch_overhead_ms_per_call": round(dispatch_ms, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
