"""Pallas TPU kernel: the full plant integration step, fused.

Latency-mode motivation: one control tick integrates the PX4-surrogate
plant with 2 RK4 substeps = 8 derivative evaluations, each ~25 small XLA ops
(rotation-matrix trig, Euler-rate transform, drag, rate lags). At ~0.5 us
per dispatched op that is ~45 us/tick — the single largest share of the
fused GP-MPC tick after the ADMM chain. This kernel runs ALL substeps in
one Pallas dispatch: the 12 state scalars live in registers, the trig and
algebra are straight VPU scalar ops, and the only memory traffic is one
(1, 16)-row load/store pair.

Semantics are bit-compatible (f32) with ``models.px4_surrogate``: mixed-NED
thrust mapping, first-order body-rate lags, guarded Euler-rate transform.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 16  # state row padded to 16 lanes (12 used)


def _derivative(s, c, mass, gravity, k_drag_linear, taus):
    """Scalar-register transcription of ``px4_surrogate._derivative``."""
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
    a_thrust = thrust_norm * gravity

    speed = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    kd = k_drag_linear / mass
    ax = a_thrust * t0 - kd * speed * vx
    ay = a_thrust * t1 - kd * speed * vy
    az = a_thrust * t2 - kd * speed * vz - gravity

    tth = sth / cth  # theta bounded in practice; guard below
    cth_safe = jnp.where(jnp.abs(cth) < 1e-6, jnp.where(cth < 0, -1e-6, 1e-6), cth)
    phi_dot = p + q * sphi * tth + r * cphi * tth
    theta_dot = q * cphi - r * sphi
    psi_dot = q * sphi / cth_safe + r * cphi / cth_safe

    p_dot = (c[1] - p) / taus[0]
    q_dot = (c[2] - q) / taus[1]
    r_dot = (c[3] - r) / taus[2]

    return (vx, vy, vz, ax, ay, az, phi_dot, theta_dot, psi_dot, p_dot, q_dot, r_dot)


def _axpy(s, k, h):
    return tuple(s[i] + h * k[i] for i in range(12))


def _make_kernel(mass, gravity, k_drag_linear, taus, dt, substeps):
    def kernel(state_ref, control_ref, out_ref):
        s = tuple(state_ref[0, i] for i in range(12))
        c = tuple(control_ref[0, i] for i in range(4))
        h = dt / substeps
        for _ in range(substeps):
            k1 = _derivative(s, c, mass, gravity, k_drag_linear, taus)
            k2 = _derivative(_axpy(s, k1, 0.5 * h), c, mass, gravity, k_drag_linear, taus)
            k3 = _derivative(_axpy(s, k2, 0.5 * h), c, mass, gravity, k_drag_linear, taus)
            k4 = _derivative(_axpy(s, k3, h), c, mass, gravity, k_drag_linear, taus)
            s = tuple(
                s[i] + (h / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i])
                for i in range(12)
            )
        row = jnp.stack(s + (jnp.float32(0.0),) * (PAD - 12)).reshape(1, PAD)
        out_ref[:] = row

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("mass", "gravity", "k_drag_linear", "taus", "dt",
                     "substeps", "interpret"),
)
def px4_plant_step_fused(
    state: jnp.ndarray,      # (12,)
    control: jnp.ndarray,    # (4,)
    mass: float,
    gravity: float,
    k_drag_linear: float,
    taus: tuple,
    dt: float,
    substeps: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """All RK4 substeps of the surrogate plant in one Pallas dispatch."""
    srow = jnp.zeros((1, PAD), jnp.float32).at[0, :12].set(state.astype(jnp.float32))
    crow = jnp.zeros((1, PAD), jnp.float32).at[0, :4].set(control.astype(jnp.float32))
    out = pl.pallas_call(
        _make_kernel(mass, gravity, k_drag_linear, taus, dt, substeps),
        out_shape=jax.ShapeDtypeStruct((1, PAD), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(srow, crow)
    return out[0, :12]
