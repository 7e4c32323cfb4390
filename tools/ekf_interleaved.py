#!/usr/bin/env python3
"""Interleaved re-measure of the EKF precision/cadence knobs on TPU.

At the noisy tier's row size (~5-9 us/tick) the axon tunnel's delivered
throughput drifts by more than the knob deltas on minute scales, so
single-pass best-of numbers are not comparable ACROSS modes (round-4
quoted a "3.75 us bf16" tick that a later pass could not reproduce).
This tool measures all three EKF modes INTERLEAVED within one process —
ROUNDS passes, each timing exact -> dispatch -> bf16 back-to-back — and
publishes the per-mode slope BAND (min/median/max across rounds), which
is the honest claim shape for sub-10-us rows.

Modes (see ``estimation.EKFConfig``):
  exact     relinearize_every="tick"      (analytic per-tick Jacobian)
  dispatch  relinearize_every="dispatch"  (frozen F per K-tick dispatch)
  bf16      dispatch + cov_precision="bf16" (single-pass Riccati dots)

Writes ``artifacts/ekf_knob_interleaved.json``. The summary rows in
``artifacts/controller_latency.json`` (tools/bench_controllers.py) are
single-pass points from the same harness; this artifact is the evidence
behind README's band phrasing.

Run:  PYTHONPATH=. python tools/ekf_interleaved.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from unmanned_aerial_vehicles_tpu.control.mpc_linear import LinearMPC, LinearMPCConfig
from unmanned_aerial_vehicles_tpu.estimation import EKFConfig, noisy_mpc_flight_rollout
from unmanned_aerial_vehicles_tpu.loop import FlightLoopConfig
from unmanned_aerial_vehicles_tpu.trajectories import ramped_circle_reference

T_SHORT, T_LONG = 400, 2000
ROUNDS, REPS = 4, 3
CFG = FlightLoopConfig()

MODES = {
    "exact": EKFConfig(),
    "dispatch": EKFConfig(relinearize_every="dispatch"),
    "bf16": EKFConfig(relinearize_every="dispatch", cov_precision="bf16"),
}


def ref(t):
    pos, _, yaw = ramped_circle_reference(t, amplitude=2.0,
                                          height=CFG.takeoff_height)
    return pos, yaw


def make_run(ekf_cfg, T):
    mpc = LinearMPC(LinearMPCConfig(horizon=20, admm_iterations=10,
                                    use_fused_controller=True))

    @jax.jit
    def run(x_jitter):
        x0 = (jnp.zeros(12, jnp.float32)
              .at[2].set(CFG.takeoff_height).at[0].set(x_jitter))
        outs = noisy_mpc_flight_rollout(
            mpc, ref, T, jax.random.PRNGKey(0),
            ekf_cfg=ekf_cfg,
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=20,
                                 fused_tick_loop_precision="default"),
            initial_state=x0,
        )
        e = outs["pos_ref"] - outs["state"][:, 0:3]
        return jnp.sqrt(jnp.mean(jnp.sum(e**2, -1)))

    return run


def main():
    # compile everything up front so rounds time pure execution
    runs = {name: {T: make_run(cfg, T) for T in (T_SHORT, T_LONG)}
            for name, cfg in MODES.items()}
    rms = {}
    for name, by_T in runs.items():
        rms[name] = float(by_T[T_SHORT](jnp.float32(0.0)))
        float(by_T[T_LONG](jnp.float32(0.0)))

    slopes = {name: [] for name in MODES}
    for rnd in range(ROUNDS):
        for name, by_T in runs.items():
            times = {}
            for T in (T_SHORT, T_LONG):
                best = float("inf")
                for rep in range(REPS):
                    # vary the input so the tunnel cannot memoize the call
                    xj = jnp.float32(0.01 * (1 + rep + REPS * rnd))
                    t0 = time.perf_counter()
                    float(by_T[T](xj))
                    best = min(best, time.perf_counter() - t0)
                times[T] = best
            slopes[name].append(
                (times[T_LONG] - times[T_SHORT]) / (T_LONG - T_SHORT) * 1e6
            )

    out = {
        "note": (
            "EKF knob ticks, slope-measured us/tick, INTERLEAVED modes "
            f"within one process ({ROUNDS} rounds x {REPS} reps, modes "
            "cycled back-to-back each round) — at this row size the "
            "tunnel's throughput drift exceeds the knob deltas, so only "
            "same-round comparisons and cross-round bands are meaningful. "
            "Loop: sensors -> in-kernel EKF -> N=20 GP-MPC -> plant, "
            "ticks_per_dispatch=20 (tools/ekf_interleaved.py)."
        ),
        "rounds": ROUNDS,
        "reps_per_point": REPS,
        "modes": {
            name: {
                "slopes_us_per_tick": [round(s, 2) for s in slopes[name]],
                "min_us": round(min(slopes[name]), 2),
                "median_us": round(float(np.median(slopes[name])), 2),
                "max_us": round(max(slopes[name]), 2),
                "rms_pos_m": round(rms[name], 4),
            }
            for name in MODES
        },
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "artifacts", "ekf_knob_interleaved.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out["modes"], indent=2))
    print("wrote", os.path.normpath(path))


if __name__ == "__main__":
    main()
