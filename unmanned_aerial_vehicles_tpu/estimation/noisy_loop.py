"""Closed loop with the estimator in it: sensors -> EKF -> MPC -> plant.

The reference's control stack always sees either PX4-EKF2 output (real
campaign) or the TRUE simulator state (standalone package) — the estimator
is never part of its own loop. Here the whole chain is one ``lax.scan``:
per tick, a noisy sensor sample of the true plant state feeds the EKF,
the controller flies the ESTIMATE, and the plant integrates the truth.
This is the configuration a deployment actually runs, and it makes
estimator-induced tracking degradation measurable in-graph.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..control.allocation import attitude_loop_init, geometric_control_allocation
from ..control.mpc_linear import LinearMPC
from ..loop.closed_loop import FlightLoopConfig, _plant_substeps
from ..models.params import RigidBodyParams
from ..models.px4_surrogate import RateLoopParams
from .ekf import EKFConfig, EKFState, ekf_init, ekf_step, measure


def noisy_mpc_flight_rollout(
    mpc: LinearMPC,
    reference_fn: Callable,
    num_steps: int,
    key: jax.Array,
    ekf_cfg: EKFConfig = EKFConfig(),
    body: RigidBodyParams = RigidBodyParams(),
    rate_loop: RateLoopParams = RateLoopParams(),
    cfg: FlightLoopConfig = FlightLoopConfig(),
    initial_state: jnp.ndarray | None = None,
    residual_fn: Callable | None = None,
    preview: bool = False,
    dtype=jnp.float32,
):
    """MPC flight on ESTIMATED state from noisy sensors.

    Mirrors ``loop.mpc_flight_rollout``'s staged step (same reference/
    allocation/plant semantics, XLA path) with the controller consuming the
    EKF estimate. MAINTENANCE NOTE: the preview/clip/allocation block is a
    deliberate copy of ``closed_loop.mpc_flight_rollout`` — changes there
    must be mirrored here;
    ``tests/test_estimation.py::test_noisy_loop_matches_ideal_with_clean_sensors``
    pins the two paths against silent divergence.
    Adds ``state_est`` (the per-tick estimate) and ``meas_pos`` (the raw
    position sample) to the output dict.
    """
    if initial_state is None:
        initial_state = jnp.zeros(12, dtype).at[2].set(cfg.takeoff_height)
    if cfg.use_fused_tick or cfg.use_pallas_plant:
        raise ValueError("noisy_mpc_flight_rollout uses the XLA plant path")

    accel_lo = jnp.asarray(cfg.accel_lower, dtype)
    accel_hi = jnp.asarray(cfg.accel_upper, dtype)
    keys = jax.random.split(key, num_steps)

    def step(carry, inputs):
        state, ekf, mpc_carry, att_carry, prev_control = carry
        i, k = inputs
        t = i.astype(dtype) * cfg.control_dt
        pos_ref, yaw_ref = reference_fn(t)
        pos_ref = jnp.asarray(pos_ref, dtype)
        yaw_ref = jnp.asarray(yaw_ref, dtype)

        # sensor sample of the TRUE state; EKF predicts with the control
        # that was actually applied over the last interval
        z = measure(state, k, ekf_cfg)
        ekf, x_est = ekf_step(
            ekf, prev_control, z, body, rate_loop, cfg.control_dt, ekf_cfg
        )

        residuals = (
            residual_fn(mpc_carry.X_prev, mpc_carry.U_prev)
            if residual_fn is not None
            else None
        )
        if preview:
            ts = t + cfg.control_dt * jnp.arange(
                1, mpc.config.horizon + 2, dtype=dtype
            )
            pos_refs, _ = jax.vmap(reference_fn)(ts)
            pos_refs = jnp.asarray(pos_refs, dtype)
            vel_refs = (pos_refs[1:] - pos_refs[:-1]) / cfg.control_dt
            ref_states = jnp.concatenate([pos_refs[:-1], vel_refs], axis=1)
        else:
            ref_states = None

        u_opt, X_opt, mpc_carry = mpc.solve(
            mpc_carry, x_est[0:6], pos_ref, residuals,
            reference_states=ref_states,
        )
        accel_des = jnp.clip(u_opt[0:3], accel_lo, accel_hi)
        yawrate_des = jnp.clip(u_opt[3], -cfg.yawrate_limit, cfg.yawrate_limit)

        thrust, rate_cmd, att_sp, att_carry = geometric_control_allocation(
            att_carry, accel_des, yaw_ref, yawrate_des,
            x_est[6:9], x_est[9:12], dt_attitude=cfg.control_dt,
        )
        control = jnp.concatenate([thrust[None], rate_cmd])
        new_state = _plant_substeps(state, control, body, rate_loop, cfg)

        out = {
            "state": state,
            "state_est": x_est,
            "meas_pos": z[0:3],
            "pos_ref": pos_ref,
            "vel_ref": X_opt[1, 3:6],
            "att_ref": att_sp,
            "thrust": thrust,
            "rates_cmd": rate_cmd,
            "accel_cmd": accel_des,
            "u_mpc": u_opt,
        }
        return (new_state, ekf, mpc_carry, att_carry, control), out

    init = (
        initial_state,
        ekf_init(initial_state, ekf_cfg, dtype),
        mpc.init_carry(initial_state[0:6]),
        attitude_loop_init(dtype),
        jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype),  # hover command
    )
    (final_state, ekf, _, _, _), outs = jax.lax.scan(
        step, init, (jnp.arange(num_steps), keys)
    )
    outs["final_state"] = final_state
    outs["final_covariance"] = ekf.P
    return outs
