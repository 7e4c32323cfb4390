"""Pallas TPU kernel: the full plant integration step, fused.

Latency-mode motivation: one control tick integrates the PX4-surrogate
plant with 2 RK4 substeps = 8 derivative evaluations, each ~25 small XLA ops
(rotation-matrix trig, Euler-rate transform, drag, rate lags). At ~0.5 us
per dispatched op that is ~45 us/tick — the single largest share of the
fused GP-MPC tick after the ADMM chain. This kernel runs ALL substeps in
one Pallas dispatch: the 12 state scalars live in registers, the trig and
algebra are straight VPU scalar ops, and the only memory traffic is two
(1, 16)-row loads and one store.

Semantics are bit-compatible (f32) with ``models.px4_surrogate``: mixed-NED
thrust mapping, first-order body-rate lags, guarded Euler-rate transform,
airspeed drag (``v - wind``; zero wind reproduces the reference's drag term
bit-for-bit, ``quadrotor_dynamics.py:180-182``).

Plant parameters are TRACED operands (one (1, 16) row), not compile-time
constants: mass/drag/rate-lag/hover-thrust dispersions and steady wind ride
the fast path, so Monte-Carlo studies and auto-tuning can ``vmap`` over
plant batches without recompiling per sample (VERDICT round-2 next-step #4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 16  # state row padded to 16 lanes (12 used)

# plant row lanes: [mass, gravity, k_drag_linear, tau_roll, tau_pitch,
#                   tau_yaw, thrust_gain, wind_x, wind_y, wind_z]
PLANT_LANES = 10


def build_plant_row(mass, gravity, k_drag_linear, taus, thrust_gain,
                    wind=(0.0, 0.0, 0.0)) -> jnp.ndarray:
    """Pack the (possibly traced) plant scalars into the kernel row layout."""
    vals = (mass, gravity, k_drag_linear, taus[0], taus[1], taus[2],
            thrust_gain, wind[0], wind[1], wind[2])
    row = jnp.stack([jnp.asarray(v, jnp.float32) for v in vals])
    return jnp.zeros((1, PAD), jnp.float32).at[0, :PLANT_LANES].set(row)


def _read_plant(plant_ref):
    """Plant scalars from the row operand (register-resident after load)."""
    return tuple(plant_ref[0, i] for i in range(PLANT_LANES))


def _derivative(s, c, plant):
    """Scalar-register transcription of ``px4_surrogate._derivative``.

    ``plant`` is the 10-scalar tuple from ``_read_plant`` — traced values,
    so one compiled kernel serves every plant in a Monte-Carlo batch.
    """
    (mass, gravity, k_drag_linear, tau_r, tau_p, tau_y,
     thrust_gain, wx, wy, wz) = plant
    vx, vy, vz = s[3], s[4], s[5]
    phi, theta, psi = s[6], s[7], s[8]
    p, q, r = s[9], s[10], s[11]
    thrust_norm = c[0]

    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    cpsi, spsi = jnp.cos(psi), jnp.sin(psi)

    # R[:, 2] with mixed-NED xy sign flip
    t0 = -(cphi * sth * cpsi + sphi * spsi)
    t1 = -(cphi * sth * spsi - sphi * cpsi)
    t2 = cphi * cth
    a_thrust = thrust_norm * thrust_gain

    # drag acts on the airspeed (v - wind); zero wind = reference behaviour.
    # The double-where guards the sqrt's gradient at exact-zero airspeed
    # (forward value unchanged): this function doubles as the staged-twin
    # backward of the plant kernels (ops.tick_ad), where an unguarded
    # sqrt(0) NaNs whole-flight gradients — same fix as px4_surrogate.
    avx, avy, avz = vx - wx, vy - wy, vz - wz
    sq = avx * avx + avy * avy + avz * avz
    pos_sq = sq > 0.0
    speed = jnp.where(pos_sq, jnp.sqrt(jnp.where(pos_sq, sq, 1.0)), 0.0)
    kd = k_drag_linear / mass
    ax = a_thrust * t0 - kd * speed * avx
    ay = a_thrust * t1 - kd * speed * avy
    az = a_thrust * t2 - kd * speed * avz - gravity

    tth = sth / cth  # theta bounded in practice; guard below
    cth_safe = jnp.where(jnp.abs(cth) < 1e-6, jnp.where(cth < 0, -1e-6, 1e-6), cth)
    phi_dot = p + q * sphi * tth + r * cphi * tth
    theta_dot = q * cphi - r * sphi
    psi_dot = q * sphi / cth_safe + r * cphi / cth_safe

    p_dot = (c[1] - p) / tau_r
    q_dot = (c[2] - q) / tau_p
    r_dot = (c[3] - r) / tau_y

    return (vx, vy, vz, ax, ay, az, phi_dot, theta_dot, psi_dot, p_dot, q_dot, r_dot)


def _axpy(s, k, h):
    return tuple(s[i] + h * k[i] for i in range(12))


def _rk4_substeps(s, c, plant, dt, substeps):
    """Unrolled RK4 substeps on register-resident state scalars."""
    h = dt / substeps
    for _ in range(substeps):
        k1 = _derivative(s, c, plant)
        k2 = _derivative(_axpy(s, k1, 0.5 * h), c, plant)
        k3 = _derivative(_axpy(s, k2, 0.5 * h), c, plant)
        k4 = _derivative(_axpy(s, k3, h), c, plant)
        s = tuple(
            s[i] + (h / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i])
            for i in range(12)
        )
    return s


def _jacobian_rows(s, c, plant):
    """Scalar-register transcription of the analytic continuous-time process
    Jacobian ``models.px4_surrogate.derivative_jacobian`` (d _derivative/ds).

    Returns 12 row tuples of 12 scalars each — built entirely from VPU
    scalar ops so the EKF transition Jacobian can be relinearised PER TICK
    inside the fused noisy kernel (``tick_pallas``) with no autodiff and no
    scatter (Mosaic supports neither). The lone guard difference vs
    ``_derivative``: the phi-row terms use the cth_safe-guarded tangent
    (``_derivative`` uses the raw one for phi_dot) — identical for any
    bounded attitude, finite at the theta singularity.
    """
    (mass, gravity, k_drag_linear, tau_r, tau_p, tau_y,
     thrust_gain, wx, wy, wz) = plant
    vx, vy, vz = s[3], s[4], s[5]
    phi, theta, psi = s[6], s[7], s[8]
    p, q, r = s[9], s[10], s[11]
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    cpsi, spsi = jnp.cos(psi), jnp.sin(psi)
    cth_safe = jnp.where(jnp.abs(cth) < 1e-6,
                         jnp.where(cth < 0, -1e-6, 1e-6), cth)
    tth = sth / cth_safe
    sec = one / cth_safe
    sec2 = sec * sec

    # drag block: -(k/m)(speed I + av av'/speed), zero at zero airspeed
    avx, avy, avz = vx - wx, vy - wy, vz - wz
    sq = avx * avx + avy * avy + avz * avz
    pos = sq > 0.0
    inv_speed = jnp.where(
        pos, one / jnp.sqrt(jnp.where(pos, sq, one)), zero
    )
    speed = sq * inv_speed
    kd = k_drag_linear / mass

    def drag(ai, aj, diag):
        return -kd * (speed * diag + ai * aj * inv_speed)

    # thrust-direction derivatives wrt the Euler angles (mixed-NED signs)
    a_thrust = c[0] * thrust_gain
    dphi = (a_thrust * (sphi * sth * cpsi - cphi * spsi),
            a_thrust * (sphi * sth * spsi + cphi * cpsi),
            a_thrust * (-sphi * cth))
    dth = (a_thrust * (-cphi * cth * cpsi),
           a_thrust * (-cphi * cth * spsi),
           a_thrust * (-cphi * sth))
    dpsi = (a_thrust * (cphi * sth * spsi - sphi * cpsi),
            a_thrust * (-(cphi * sth * cpsi + sphi * spsi)),
            zero)

    z12 = (zero,) * 12
    rows = [
        z12[:3] + (one, zero, zero) + z12[:6],
        z12[:4] + (one, zero) + z12[:6],
        z12[:5] + (one,) + z12[:6],
        (zero, zero, zero,
         drag(avx, avx, one), drag(avx, avy, zero), drag(avx, avz, zero),
         dphi[0], dth[0], dpsi[0], zero, zero, zero),
        (zero, zero, zero,
         drag(avy, avx, zero), drag(avy, avy, one), drag(avy, avz, zero),
         dphi[1], dth[1], dpsi[1], zero, zero, zero),
        (zero, zero, zero,
         drag(avz, avx, zero), drag(avz, avy, zero), drag(avz, avz, one),
         dphi[2], dth[2], dpsi[2], zero, zero, zero),
        (zero, zero, zero, zero, zero, zero,
         q * cphi * tth - r * sphi * tth, (q * sphi + r * cphi) * sec2,
         zero, one, sphi * tth, cphi * tth),
        (zero, zero, zero, zero, zero, zero,
         -q * sphi - r * cphi, zero, zero, zero, cphi, -sphi),
        (zero, zero, zero, zero, zero, zero,
         (q * cphi - r * sphi) * sec, (q * sphi + r * cphi) * sth * sec2,
         zero, zero, sphi * sec, cphi * sec),
        z12[:9] + (-one / tau_r, zero, zero),
        z12[:9] + (zero, -one / tau_p, zero),
        z12[:9] + (zero, zero, -one / tau_y),
    ]
    return rows


def _jac_padded(s, c, plant, pk):
    """The analytic Jacobian as a zero-padded (pk, pk) matrix (no scatter:
    12 row stacks + a zero block, the Mosaic-legal construction)."""
    zero = jnp.float32(0.0)
    rows = [
        jnp.stack(row + (zero,) * (pk - 12))
        for row in _jacobian_rows(s, c, plant)
    ]
    top = jnp.stack(rows)
    return jnp.concatenate(
        [top, jnp.zeros((pk - 12, pk), jnp.float32)], axis=0
    )


def _make_kernel(dt, substeps):
    def kernel(state_ref, control_ref, plant_ref, out_ref):
        s = tuple(state_ref[0, i] for i in range(12))
        c = tuple(control_ref[0, i] for i in range(4))
        plant = _read_plant(plant_ref)
        s = _rk4_substeps(s, c, plant, dt, substeps)
        row = jnp.stack(s + (jnp.float32(0.0),) * (PAD - 12)).reshape(1, PAD)
        out_ref[:] = row

    return kernel


def _allocation(s, cmd, integral, dt, gravity,
                kp=3.2, ki=0.6, kd=0.6, integral_max=0.3,
                thrust_ceiling=1.2):
    """Scalar transcription of ``control.allocation.
    geometric_control_allocation`` (mpc.py:2057-2113). ``thrust_ceiling``
    may be a traced scalar (recovery modes raise it)."""
    ax, ay, az, yawrate_des, target_yaw = cmd[0], cmd[1], cmd[2], cmd[3], cmd[4]

    tvx, tvy, tvz = ax, ay, az + gravity
    tmag = jnp.sqrt(tvx * tvx + tvy * tvy + tvz * tvz)
    thrust = jnp.clip(tmag / gravity, 0.25, thrust_ceiling)

    inv = 1.0 / jnp.maximum(tmag, 1e-9)

    def asin(x):
        # Pallas TPU lowers neither asin nor atan2. Inputs are clipped to
        # +-0.4, where the Maclaurin series through x^13 is accurate to
        # ~1.5e-8 — below f32 epsilon at these magnitudes.
        x2 = x * x
        return x * (
            1.0
            + x2 * (1.0 / 6.0
            + x2 * (3.0 / 40.0
            + x2 * (15.0 / 336.0
            + x2 * (105.0 / 3456.0
            + x2 * (945.0 / 42240.0
                    + x2 * (10395.0 / 599040.0))))))
        )

    pitch_cmd = -asin(jnp.clip(tvx * inv, -0.4, 0.4))
    roll_cmd = asin(jnp.clip(tvy * inv, -0.4, 0.4))
    degenerate = tmag <= 0.1
    pitch_cmd = jnp.where(degenerate, 0.0, pitch_cmd)
    roll_cmd = jnp.where(degenerate, 0.0, roll_cmd)

    two_pi = 2.0 * jnp.pi
    wrap = lambda a: (a + jnp.pi) % two_pi - jnp.pi
    e0 = wrap(roll_cmd - s[6])
    e1 = wrap(pitch_cmd - s[7])
    e2 = wrap(target_yaw - s[8])

    i0 = jnp.clip(integral[0] + e0 * dt, -integral_max, integral_max)
    i1 = jnp.clip(integral[1] + e1 * dt, -integral_max, integral_max)
    i2 = jnp.clip(integral[2] + e2 * dt, -integral_max, integral_max)

    rollrate = jnp.clip(kp * e0 + ki * i0 - kd * s[9], -1.2, 1.2)
    pitchrate = jnp.clip(kp * e1 + ki * i1 - kd * s[10], -1.2, 1.2)
    yawrate = jnp.clip(yawrate_des + kp * e2 + ki * i2 - kd * s[11], -0.8, 0.8)

    control = (thrust, rollrate, pitchrate, yawrate)
    att_sp = (roll_cmd, pitch_cmd, target_yaw)
    return control, att_sp, (i0, i1, i2)


def _make_tick_kernel(dt, substeps):
    def kernel(state_ref, cmd_ref, integral_ref, plant_ref,
               out_state_ref, out_ctrl_ref, out_int_ref):
        s = tuple(state_ref[0, i] for i in range(12))
        cmd = tuple(cmd_ref[0, i] for i in range(5))
        integral = tuple(integral_ref[0, i] for i in range(3))
        plant = _read_plant(plant_ref)

        # cmd lane 5 carries the (possibly recovery-raised) thrust ceiling
        c, att_sp, new_int = _allocation(
            s, cmd, integral, dt, plant[1], thrust_ceiling=cmd_ref[0, 5]
        )
        s = _rk4_substeps(s, c, plant, dt, substeps)
        zero = jnp.float32(0.0)
        out_state_ref[:] = jnp.stack(s + (zero,) * (PAD - 12)).reshape(1, PAD)
        # control (4) + attitude setpoint (3) packed in one row
        out_ctrl_ref[:] = jnp.stack(
            c + att_sp + (zero,) * (PAD - 7)
        ).reshape(1, PAD)
        out_int_ref[:] = jnp.stack(new_int + (zero,) * (PAD - 3)).reshape(1, PAD)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("dt", "substeps", "interpret"),
)
def allocation_plant_tick_fused(
    state: jnp.ndarray,       # (12,)
    accel_des: jnp.ndarray,   # (3,) already clipped
    yawrate_des: jnp.ndarray,  # ()
    target_yaw: jnp.ndarray,   # ()
    att_integral: jnp.ndarray,  # (3,)
    mass,
    gravity,
    k_drag_linear,
    taus,
    dt: float,
    substeps: int = 2,
    interpret: bool = False,
    thrust_gain=None,          # g / hover_thrust_norm; None -> g
    wind=(0.0, 0.0, 0.0),
    thrust_ceiling=1.2,
):
    """Geometric allocation + attitude PID + all plant RK4 substeps, fused.

    Returns ``(new_state (12,), control4, att_setpoint3, new_integral (3,))``
    — semantics identical to ``geometric_control_allocation`` followed by
    ``px4_plant_step_fused``. Plant scalars (and wind) are traced operands;
    ``thrust_ceiling`` may be traced too (recovery modes raise it).
    """
    srow = jnp.zeros((1, PAD), jnp.float32).at[0, :12].set(state.astype(jnp.float32))
    cmd = jnp.concatenate(
        [accel_des.astype(jnp.float32),
         jnp.asarray(yawrate_des, jnp.float32)[None],
         jnp.asarray(target_yaw, jnp.float32)[None],
         jnp.asarray(thrust_ceiling, jnp.float32)[None]]
    )
    crow = jnp.zeros((1, PAD), jnp.float32).at[0, :6].set(cmd)
    irow = jnp.zeros((1, PAD), jnp.float32).at[0, :3].set(
        att_integral.astype(jnp.float32)
    )
    prow = build_plant_row(
        mass, gravity, k_drag_linear, taus,
        gravity if thrust_gain is None else thrust_gain, wind,
    )
    new_state, ctrl, new_int = pl.pallas_call(
        _make_tick_kernel(dt, substeps),
        out_shape=(
            jax.ShapeDtypeStruct((1, PAD), jnp.float32),
            jax.ShapeDtypeStruct((1, PAD), jnp.float32),
            jax.ShapeDtypeStruct((1, PAD), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(srow, crow, irow, prow)
    return (
        new_state[0, :12],
        ctrl[0, 0:4],
        ctrl[0, 4:7],
        new_int[0, :3],
    )


@functools.partial(
    jax.jit, static_argnames=("dt", "substeps", "interpret"),
)
def px4_plant_step_fused(
    state: jnp.ndarray,      # (12,)
    control: jnp.ndarray,    # (4,)
    mass,
    gravity,
    k_drag_linear,
    taus,
    dt: float,
    substeps: int = 2,
    interpret: bool = False,
    thrust_gain=None,          # g / hover_thrust_norm; None -> g
    wind=(0.0, 0.0, 0.0),
) -> jnp.ndarray:
    """All RK4 substeps of the surrogate plant in one Pallas dispatch.

    Plant scalars are traced operands — dispersed plants/wind batches reuse
    one compiled kernel (``vmap`` adds a grid axis, no recompiles)."""
    srow = jnp.zeros((1, PAD), jnp.float32).at[0, :12].set(state.astype(jnp.float32))
    crow = jnp.zeros((1, PAD), jnp.float32).at[0, :4].set(control.astype(jnp.float32))
    prow = build_plant_row(
        mass, gravity, k_drag_linear, taus,
        gravity if thrust_gain is None else thrust_gain, wind,
    )
    out = pl.pallas_call(
        _make_kernel(dt, substeps),
        out_shape=jax.ShapeDtypeStruct((1, PAD), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(srow, crow, prow)
    return out[0, :12]
