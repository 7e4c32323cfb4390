"""Full mission rollout: the flight node's phase machine, fused.

The reference nodes run a wall-clock phase machine — prepare (t<2 s), arm
(t<4 s), take off (t<8 s), hover (t<20 s), then the MPC/PID trajectory phase
(``/root/reference/src/px4/mpc.py:2238-2310``,
``cascade_pid_demo.py:471-560``) — publishing different PX4 setpoint types
per phase. Arming/offboard handshakes are PX4 bookkeeping with no plant
dynamics; what shapes the trajectory is WHICH controller drives each phase:

* prepare/arm: hold position commands (we model as hover-hold PD);
* takeoff/hover: PX4 position controller -> modelled with the node's own
  fallback PD law (``mpc.py:2117-2130``: a = 1.5 e_pos - 0.8 v, clipped);
* trajectory: the MPC + geometric allocation path.

Here the phase machine is branchless: per-tick phase index from static time
boundaries, ``lax.switch``-free (the PD and MPC commands are both computed
and selected with ``where`` — both are cheap, and this keeps the program
shape static for vmap over missions).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..control.allocation import attitude_loop_init, geometric_control_allocation
from ..control.mpc_linear import LinearMPC
from ..models.params import RigidBodyParams
from ..models.px4_surrogate import RateLoopParams
from .closed_loop import FlightLoopConfig, _plant_substeps

# phase boundaries in seconds (mpc.py:2242-2262)
PREPARE_END = 2.0
ARM_END = 4.0
TAKEOFF_END = 8.0
HOVER_END = 20.0


def mission_rollout(
    mpc: LinearMPC,
    reference_fn: Callable,
    duration: float = 60.0,
    cfg: FlightLoopConfig = FlightLoopConfig(),
    body: RigidBodyParams = RigidBodyParams(),
    rate_loop: RateLoopParams = RateLoopParams(),
    residual_fn: Callable | None = None,
    key: jax.Array | None = None,
    ekf_cfg=None,
    disturbance_observer=None,
    wind_fn: Callable | None = None,
    dtype=jnp.float32,
):
    """Ground -> arm -> takeoff -> hover -> trajectory, one fused scan.

    ``reference_fn(flight_time) -> (pos3, yaw)`` is the trajectory-phase
    reference, fed the time SINCE the trajectory phase began
    (``flight_time = current_time - 20``, ``mpc.py:2263``).
    Starts on the ground at the origin.

    ``key`` switches the WHOLE mission onto estimated state — the
    reference node's actual regime: every phase (the PD pre-phases
    included) consumes PX4-EKF2 output, never truth
    (``src/px4/mpc.py:1889-1907``). Sensors are drawn per tick
    (``estimation.measure``), the 12-state EKF (or, with
    ``disturbance_observer=``, the 15-state augmented observer whose
    accel-disturbance estimate feeds the MPC's residual rows) fuses them,
    and PD/MPC/allocation all fly the ESTIMATE while the true plant
    integrates ``body`` (wind optionally time-varying via ``wind_fn(t)``).
    Adds ``state_est`` (and ``disturbance_est``) to the output dict.
    """
    noisy = key is not None
    if (disturbance_observer or wind_fn is not None) and not noisy:
        raise ValueError(
            "disturbance_observer=/wind_fn= require the noisy mission "
            "(pass key=): the observer fuses drawn sensor samples"
        )
    if noisy:
        from ..estimation import EKFConfig, ekf_init, ekf_step, measure

        if ekf_cfg is None:
            ekf_cfg = EKFConfig()
        if disturbance_observer is not None and \
                disturbance_observer is not False:
            from ..estimation.disturbance import (
                DisturbanceEKFConfig,
                dekf_init,
                dekf_step,
                disturbance_residual_rows,
            )

            dob_cfg = (
                DisturbanceEKFConfig(base=ekf_cfg)
                if disturbance_observer is True else disturbance_observer
            )
            nominal_body = body.replace(wind=(0.0, 0.0, 0.0))
        else:
            dob_cfg = None
        meas_cfg = dob_cfg.base if dob_cfg is not None else ekf_cfg
    else:
        dob_cfg = None

    num_steps = int(duration / cfg.control_dt)
    accel_lo = jnp.asarray(cfg.accel_lower, dtype)
    accel_hi = jnp.asarray(cfg.accel_upper, dtype)
    takeoff_target = jnp.asarray([0.0, 0.0, cfg.takeoff_height], dtype)
    keys = jax.random.split(key, num_steps) if noisy else None

    def step(carry, inputs):
        if noisy:
            i, k = inputs
            state, ekf, mpc_carry, att_carry, prev_control = carry
        else:
            i = inputs
            state, mpc_carry, att_carry = carry
        t = i.astype(dtype) * cfg.control_dt
        in_trajectory = t >= HOVER_END
        flight_time = jnp.maximum(t - HOVER_END, 0.0)

        pos_ref, yaw_ref = reference_fn(flight_time)
        # guard against x64 promotion leaking in from user reference fns
        pos_ref = jnp.asarray(pos_ref, dtype)
        yaw_ref = jnp.asarray(yaw_ref, dtype)
        # pre-trajectory phases target the takeoff point (z ramps in early
        # phases exactly like the position setpoints the node publishes)
        pre_target = jnp.where(
            t < PREPARE_END,
            jnp.zeros(3, dtype),                    # on-ground setpoint
            takeoff_target,                         # climb + hover setpoint
        )
        target = jnp.where(in_trajectory, pos_ref, pre_target)
        yaw_t = jnp.where(in_trajectory, yaw_ref, 0.0)

        # --- estimation (noisy mission: every phase flies the estimate) --
        body_t = (
            body if wind_fn is None
            else body.replace(wind=jnp.asarray(wind_fn(t), dtype))
        )
        if noisy:
            z = measure(state, k, meas_cfg)
            if dob_cfg is not None:
                ekf, x_ctl, d_est = dekf_step(
                    ekf, prev_control, z, nominal_body, rate_loop,
                    cfg.control_dt, dob_cfg,
                )
            else:
                ekf, x_ctl = ekf_step(
                    ekf, prev_control, z, body_t, rate_loop,
                    cfg.control_dt, ekf_cfg,
                )
        else:
            x_ctl = state

        # --- PD command (pre-trajectory; mpc.py:2117-2130) --------------
        pd_accel = 1.5 * (target - x_ctl[0:3]) - 0.8 * x_ctl[3:6]
        pd_accel = jnp.clip(
            pd_accel,
            jnp.asarray([-3.0, -3.0, -4.0], dtype),
            jnp.asarray([3.0, 3.0, 5.0], dtype),
        )

        # --- MPC command (trajectory phase) ------------------------------
        residuals = (
            residual_fn(mpc_carry.X_prev, mpc_carry.U_prev)
            if residual_fn is not None
            else None
        )
        if dob_cfg is not None:
            dob_rows = disturbance_residual_rows(
                d_est, mpc.config.horizon, dtype
            )
            residuals = (
                dob_rows if residuals is None else residuals + dob_rows
            )
        u_opt, _, mpc_carry = mpc.solve(mpc_carry, x_ctl[0:6], target, residuals)

        accel_des = jnp.where(
            in_trajectory, jnp.clip(u_opt[0:3], accel_lo, accel_hi), pd_accel
        )
        yawrate_des = jnp.where(
            in_trajectory, jnp.clip(u_opt[3], -cfg.yawrate_limit, cfg.yawrate_limit), 0.0
        )

        thrust, rate_cmd, att_sp, att_carry = geometric_control_allocation(
            att_carry, accel_des, yaw_t, yawrate_des,
            x_ctl[6:9], x_ctl[9:12], dt_attitude=cfg.control_dt,
        )
        control = jnp.concatenate([thrust[None], rate_cmd])
        new_state = _plant_substeps(state, control, body_t, rate_loop, cfg)

        phase = (
            (t >= PREPARE_END).astype(jnp.int32)
            + (t >= ARM_END).astype(jnp.int32)
            + (t >= TAKEOFF_END).astype(jnp.int32)
            + (t >= HOVER_END).astype(jnp.int32)
        )
        out = {
            "state": state,
            "target": target,
            "phase": phase,
            "thrust": thrust,
            "in_trajectory": in_trajectory,
        }
        if noisy:
            out["state_est"] = x_ctl
            if dob_cfg is not None:
                out["disturbance_est"] = d_est
            new_carry = (new_state, ekf, mpc_carry, att_carry, control)
        else:
            new_carry = (new_state, mpc_carry, att_carry)
        return new_carry, out

    x0 = jnp.zeros(12, dtype)  # on the ground
    if noisy:
        init = (
            x0,
            dekf_init(x0, dob_cfg, dtype) if dob_cfg is not None
            else ekf_init(x0, ekf_cfg, dtype),
            mpc.init_carry(x0[0:6]),
            attitude_loop_init(dtype),
            jnp.asarray([0.0, 0.0, 0.0, 0.0], dtype),  # grounded: no thrust
        )
        final_carry, outs = jax.lax.scan(
            step, init, (jnp.arange(num_steps), keys)
        )
        final_state = final_carry[0]
    else:
        init = (x0, mpc.init_carry(x0[0:6]), attitude_loop_init(dtype))
        (final_state, _, _), outs = jax.lax.scan(
            step, init, jnp.arange(num_steps)
        )
    outs["final_state"] = final_state
    return outs
