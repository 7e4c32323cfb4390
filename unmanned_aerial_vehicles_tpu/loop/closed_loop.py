"""Fused closed-loop rollouts (reference -> controller -> allocation -> plant).

The reference runs its control loops as ROS 2 timer callbacks across multiple
processes (controller node -> DDS -> microXRCE -> PX4 -> Gazebo, SURVEY.md
section 3.1). Here a whole flight is ONE jitted ``lax.scan``: every tick fuses
trajectory evaluation, the controller, geometric allocation and the plant
into a single XLA program, and ``vmap`` turns one flight into a 1k-flight
batch sweep (BASELINE.json config 5).

Loop structure mirrors the trajectory phase of the reference nodes:

* ``pid_flight_rollout`` — 9-loop cascade PID @ 50 Hz commanding body rates +
  thrust, plant integrating at 100 Hz
  (``/root/reference/src/px4/cascade_pid_demo.py:471-560``).
* ``mpc_flight_rollout`` — linear MPC @ 50 Hz -> acceleration clip ->
  geometric allocation -> body rates + thrust
  (``/root/reference/src/px4/mpc.py:2238-2310`` trajectory phase, with the
  MPC accel clips of ``mpc.py:2030-2040``).

The plant is the PX4 surrogate (rate-tracking inner loop), standing in for
PX4 SITL + Gazebo so runs are comparable to the baseline campaign.
"""

from __future__ import annotations

from typing import Callable, Tuple

from flax import struct
import jax
import jax.numpy as jnp

from ..control.allocation import attitude_loop_init, geometric_control_allocation
from ..control.cascade_pid import CascadePidGains, cascade_init, cascade_pid_step
from ..control.mpc_linear import LinearMPC
from ..models.params import RigidBodyParams
from ..models.px4_surrogate import RateLoopParams, px4_rate_tracking_step


@struct.dataclass
class FlightLoopConfig:
    control_dt: float = 0.02      # 50 Hz control loop (mpc.py:1868)
    plant_substeps: int = 2       # plant RK4 at 100 Hz (quadrotor_dynamics.py:85)
    takeoff_height: float = 3.0   # mpc.py:1724
    accel_lower: Tuple[float, float, float] = (-3.5, -3.5, -4.0)  # mpc.py:2033
    accel_upper: Tuple[float, float, float] = (3.5, 3.5, 6.0)
    yawrate_limit: float = 0.8    # mpc.py:2035
    # run all plant RK4 substeps as ONE Pallas kernel (latency mode, f32,
    # bit-exact vs the XLA path; ~2x faster per tick on v5e)
    use_pallas_plant: bool = False


def _plant_substeps(state, control, body, rate_loop, cfg: FlightLoopConfig):
    if cfg.use_pallas_plant:
        from ..ops.plant_pallas import px4_plant_step_fused

        return px4_plant_step_fused(
            state, control, body.mass, body.gravity, body.k_drag_linear,
            (rate_loop.tau_roll, rate_loop.tau_pitch, rate_loop.tau_yaw),
            cfg.control_dt, cfg.plant_substeps,
            thrust_gain=body.gravity / rate_loop.hover_thrust_norm,
        ).astype(state.dtype)

    dt_sub = cfg.control_dt / cfg.plant_substeps

    def sub(x, _):
        return px4_rate_tracking_step(x, control, body, rate_loop, dt_sub), None

    state, _ = jax.lax.scan(sub, state, None, length=cfg.plant_substeps)
    return state


def pid_flight_rollout(
    reference_fn: Callable,
    num_steps: int,
    gains: CascadePidGains | None = None,
    body: RigidBodyParams = RigidBodyParams(),
    rate_loop: RateLoopParams = RateLoopParams(),
    cfg: FlightLoopConfig = FlightLoopConfig(),
    initial_state: jnp.ndarray | None = None,
    dtype=jnp.float32,
):
    """Closed-loop cascade-PID flight.

    ``reference_fn(t) -> (pos3, yaw)`` in world frame (absolute z).
    Returns a dict of stacked per-tick signals.
    """
    if gains is None:
        gains = CascadePidGains.default()
    # pin the gain pytree to the loop dtype (CascadePidGains.default() builds
    # f64 leaves when x64 is on, which would promote the scan carries)
    gains = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), gains)
    if initial_state is None:
        initial_state = jnp.zeros(12, dtype).at[2].set(cfg.takeoff_height)

    def step(carry, i):
        state, pid_state = carry
        t = i.astype(dtype) * cfg.control_dt
        pos_ref, yaw_ref = reference_fn(t)
        # guard against x64 promotion leaking in from user reference fns
        pos_ref = jnp.asarray(pos_ref, dtype)
        yaw_ref = jnp.asarray(yaw_ref, dtype)

        control, pid_state, aux = cascade_pid_step(
            gains, pid_state, state, pos_ref, yaw_ref, cfg.control_dt
        )
        new_state = _plant_substeps(state, control, body, rate_loop, cfg)

        out = {
            "state": state,
            "pos_ref": pos_ref,
            "vel_ref": aux["velocity_setpoint"],
            "att_ref": aux["attitude_setpoint"],
            "thrust": control[0],
            "rates_cmd": control[1:4],
        }
        return (new_state, pid_state), out

    (final_state, _), outs = jax.lax.scan(
        step, (initial_state, cascade_init(dtype)), jnp.arange(num_steps)
    )
    outs["final_state"] = final_state
    return outs


def mpc_flight_rollout(
    mpc: LinearMPC,
    reference_fn: Callable,
    num_steps: int,
    body: RigidBodyParams = RigidBodyParams(),
    rate_loop: RateLoopParams = RateLoopParams(),
    cfg: FlightLoopConfig = FlightLoopConfig(),
    initial_state: jnp.ndarray | None = None,
    residual_fn: Callable | None = None,
    output_correction_fn: Callable | None = None,
    preview: bool = False,
    dtype=jnp.float32,
):
    """Closed-loop linear-MPC flight (optionally GP-enhanced).

    ``reference_fn(t) -> (pos3, yaw)``; ``residual_fn(X_guess, U_guess)``
    optionally produces the ``(N, 6)`` stage residual array from the MPC's
    warm-start trajectory (the GP hook; see ``gp.residual_gp``).

    ``output_correction_fn(state6, u_opt, pos_ref) -> u_opt`` is the OTHER
    GP generation — the reference's earlier architecture where the GP
    corrects the solved control post-solve instead of entering the dynamics
    (``gp.residual_gp.make_output_correction_fn``; mpc_gp.py:341-372). The
    two hooks are independent, matching the reference's two generations.

    ``preview=True`` feeds the MPC per-stage references sampled along the
    horizon (position + finite-difference velocity) instead of the
    reference node's single point target — same QP, removes the point
    -target tracking lag.
    Returns a dict of stacked per-tick signals.
    """
    if initial_state is None:
        initial_state = jnp.zeros(12, dtype).at[2].set(cfg.takeoff_height)

    accel_lo = jnp.asarray(cfg.accel_lower, dtype)
    accel_hi = jnp.asarray(cfg.accel_upper, dtype)

    def step(carry, i):
        state, mpc_carry, att_carry = carry
        t = i.astype(dtype) * cfg.control_dt
        pos_ref, yaw_ref = reference_fn(t)
        # guard against x64 promotion leaking in from user reference fns
        pos_ref = jnp.asarray(pos_ref, dtype)
        yaw_ref = jnp.asarray(yaw_ref, dtype)

        mpc_state = state[0:6]
        residuals = (
            residual_fn(mpc_carry.X_prev, mpc_carry.U_prev)
            if residual_fn is not None
            else None
        )
        if preview:
            ts = t + cfg.control_dt * jnp.arange(1, mpc.config.horizon + 2, dtype=dtype)
            pos_refs, _ = jax.vmap(reference_fn)(ts)       # (N+1, 3)
            pos_refs = jnp.asarray(pos_refs, dtype)
            vel_refs = (pos_refs[1:] - pos_refs[:-1]) / cfg.control_dt
            ref_states = jnp.concatenate([pos_refs[:-1], vel_refs], axis=1)
        else:
            ref_states = None
        u_opt, X_opt, mpc_carry = mpc.solve(
            mpc_carry, mpc_state, pos_ref, residuals, reference_states=ref_states
        )
        if output_correction_fn is not None:
            u_opt = output_correction_fn(mpc_state, u_opt, pos_ref)

        accel_des = jnp.clip(u_opt[0:3], accel_lo, accel_hi)
        yawrate_des = jnp.clip(u_opt[3], -cfg.yawrate_limit, cfg.yawrate_limit)

        if cfg.use_pallas_plant:
            # allocation + attitude PID + all plant substeps in ONE kernel
            from ..control.allocation import AttitudeLoopState
            from ..ops.plant_pallas import allocation_plant_tick_fused

            new_state, control, att_sp, new_int = allocation_plant_tick_fused(
                state, accel_des, yawrate_des, yaw_ref, att_carry.integral,
                body.mass, body.gravity, body.k_drag_linear,
                (rate_loop.tau_roll, rate_loop.tau_pitch, rate_loop.tau_yaw),
                cfg.control_dt, cfg.plant_substeps,
                thrust_gain=body.gravity / rate_loop.hover_thrust_norm,
            )
            new_state = new_state.astype(state.dtype)
            att_carry = AttitudeLoopState(integral=new_int.astype(dtype))
            thrust, rate_cmd = control[0], control[1:4]
        else:
            thrust, rate_cmd, att_sp, att_carry = geometric_control_allocation(
                att_carry,
                accel_des,
                yaw_ref,
                yawrate_des,
                state[6:9],
                state[9:12],
                dt_attitude=cfg.control_dt,
            )
            control = jnp.concatenate([thrust[None], rate_cmd])
            new_state = _plant_substeps(state, control, body, rate_loop, cfg)

        out = {
            "state": state,
            "pos_ref": pos_ref,
            "vel_ref": X_opt[1, 3:6],   # predicted next velocity (mpc.py:2042)
            "att_ref": att_sp,
            "thrust": thrust,
            "rates_cmd": rate_cmd,
            "accel_cmd": accel_des,
            "u_mpc": u_opt,   # raw (pre-clip) QP solution — parity tests
        }
        return (new_state, mpc_carry, att_carry), out

    init = (
        initial_state,
        mpc.init_carry(initial_state[0:6]),
        attitude_loop_init(dtype),
    )
    (final_state, _, _), outs = jax.lax.scan(step, init, jnp.arange(num_steps))
    outs["final_state"] = final_state
    return outs
