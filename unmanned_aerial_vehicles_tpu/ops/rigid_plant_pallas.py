"""Fused 12-state rigid-body RK4 plant kernel.

Measured (v5e-1, slope between scan lengths): one XLA
``models.rigid_body_rk4_step`` costs ~44 us — 4 derivative evaluations of
~7 us each, every one a swarm of tiny HLO ops (3x3 rotation build, einsum,
cross product) that dispatch-bound the serial chain. That single step was
the dominant cost of EVERY per-tick 12-state row (the controller chains
sit at 10-35 us), and an N-step plan re-anchor roll through it cost
~0.9 ms/dispatch. This kernel runs n sequential RK4 steps (with per-step
controls and optional per-step derivative residuals) as ONE Pallas
dispatch of pure scalar arithmetic — the same pattern as the in-kernel
direct-rate plant (``ops.rigid_tick_pallas._plant_sub``).

Math is IDENTICAL to ``models.rigid_body.rigid_body_rk4_step`` /
``rigid_body_derivative`` (reference semantics
``quadrotor_dynamics.py:148-228``): ZYX rotation thrust column, airspeed
quadratic drag with the gradient-safe norm, Euler-rate transform with the
reference's |cos(theta)| >= 1e-6 singularity guard, gyroscopic
``omega x (I omega)`` and angular drag. Parity is pinned in
``tests/test_rigid_plant_kernel.py`` (f32 agreement incl. near-singular
pitch and nonzero wind/residuals).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.params import RigidBodyParams


def make_plant_math(h, mass, gravity, k_lin, k_ang, inertia, wind):
    """Shared in-kernel rigid-body math: ``deriv(s, u, res)`` and
    ``rk4(s, u, res)`` over 12-tuples of same-shaped operands (scalars in
    the single-trajectory rollout kernel, ``(sub, 128)`` sample blocks in
    the MPPI sampling kernel — the expressions are shape-polymorphic).
    ``res`` is an optional 12-tuple of derivative residuals (``None``
    skips the adds). One definition so a plant-model change cannot
    silently diverge between the kernels that must match it."""
    g = float(gravity)
    m_ = float(mass)
    kl = float(k_lin)
    ka = float(k_ang)
    ix, iy, iz = (float(v) for v in inertia)
    wx, wy, wz = (float(v) for v in wind)
    h = float(h)

    def deriv(s, u, res=None):
        vx, vy, vz = s[3], s[4], s[5]
        phi, th = s[6], s[7]
        psi = s[8]
        p, q, r = s[9], s[10], s[11]
        T = u[0]
        sphi, cphi = jnp.sin(phi), jnp.cos(phi)
        sth, cth = jnp.sin(th), jnp.cos(th)
        spsi, cpsi = jnp.sin(psi), jnp.cos(psi)
        # R[:, 2] of Rz @ Ry @ Rx (utils.rotations.euler_to_rotation_matrix)
        r02 = cphi * sth * cpsi + sphi * spsi
        r12 = cphi * sth * spsi - sphi * cpsi
        r22 = cphi * cth
        ax_, ay_, az_ = vx - wx, vy - wy, vz - wz
        sq = ax_ * ax_ + ay_ * ay_ + az_ * az_
        speed = jnp.where(
            sq > 0.0, jnp.sqrt(jnp.where(sq > 0.0, sq, 1.0)), 0.0)
        accx = (T * r02 - kl * speed * ax_) / m_
        accy = (T * r12 - kl * speed * ay_) / m_
        accz = (T * r22 - kl * speed * az_) / m_ - g
        # Euler-rate transform with the reference's singularity guard
        # (utils.rotations.euler_rate_transform: tan(theta) on row 0,
        # guarded 1/cos(theta) on row 2)
        cth_safe = jnp.where(
            jnp.abs(cth) < 1e-6, jnp.where(cth < 0.0, -1e-6, 1e-6), cth)
        tth = jnp.tan(th)
        dphi = p + q * sphi * tth + r * cphi * tth
        dth = q * cphi - r * sphi
        dpsi = (q * sphi + r * cphi) / cth_safe
        # omega x (I omega), elementwise inertia
        gyx = q * (iz * r) - r * (iy * q)
        gyy = r * (ix * p) - p * (iz * r)
        gyz = p * (iy * q) - q * (ix * p)
        dp = (u[1] - gyx - ka * p) / ix
        dq = (u[2] - gyy - ka * q) / iy
        dr = (u[3] - gyz - ka * r) / iz
        d = (vx, vy, vz, accx, accy, accz, dphi, dth, dpsi, dp, dq, dr)
        if res is None:
            return d
        return tuple(d[i] + res[i] for i in range(12))

    def axpy(s, k, a):
        return tuple(s[i] + a * k[i] for i in range(12))

    def rk4(s, u, res=None):
        k1 = deriv(s, u, res)
        k2 = deriv(axpy(s, k1, 0.5 * h), u, res)
        k3 = deriv(axpy(s, k2, 0.5 * h), u, res)
        k4 = deriv(axpy(s, k3, h), u, res)
        return tuple(
            s[i] + (h / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i])
            for i in range(12)
        )

    return deriv, rk4


def _make_rollout_kernel(n_steps, dt, substeps, mass, gravity,
                         k_lin, k_ang, inertia, wind, interpret=False):
    _, rk4 = make_plant_math(float(dt) / substeps, mass, gravity,
                             k_lin, k_ang, inertia, wind)

    def kernel(x_ref, u_ref, res_ref, x_out_ref):
        zero = jnp.float32(0.0)

        def one_step(i, s):
            u_row = u_ref[pl.ds(i, 1), :]
            r_row = res_ref[pl.ds(i, 1), :]
            u = tuple(u_row[0, j] for j in range(4))
            res = tuple(r_row[0, j] for j in range(12))
            for _ in range(substeps):
                s = rk4(s, u, res)
            x_out_ref[pl.ds(i, 1), :] = jnp.stack(
                s + (zero,) * (x_out_ref.shape[1] - 12)
            ).reshape(1, x_out_ref.shape[1])
            return s

        s0 = tuple(x_ref[0, i] for i in range(12))
        jax.lax.fori_loop(0, n_steps, one_step, s0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "dt", "substeps", "mass", "gravity",
                     "k_lin", "k_ang", "inertia", "wind", "interpret"),
)
def _rollout_call(x_row, u_rows, res_rows, n_steps, dt, substeps,
                  mass, gravity, k_lin, k_ang, inertia, wind, interpret):
    base = _make_rollout_kernel(
        n_steps, dt, substeps, mass, gravity, k_lin, k_ang,
        inertia, wind, interpret=interpret,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        base,
        out_shape=jax.ShapeDtypeStruct((n_steps, 16), jnp.float32),
        in_specs=[vmem] * 3,
        out_specs=vmem,
        interpret=interpret,
    )(x_row, u_rows, res_rows)


def _resolve_interpret(interpret):
    # interpret everywhere Mosaic can't compile (CPU, GPU) — only the TPU
    # backend lowers these kernels natively
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def rigid_body_rollout_fused(
    x0: jnp.ndarray,                    # (12,)
    controls: jnp.ndarray,              # (n, 4) per-step [T, tau x3]
    params: RigidBodyParams,
    dt: float,
    substeps: int = 1,
    residuals: jnp.ndarray | None = None,   # (n, 12) derivative residuals
    interpret: bool | None = None,
) -> jnp.ndarray:
    """n sequential RK4 steps in one kernel; returns the (n, 12) states
    AFTER each step. ``substeps`` subdivides each step's dt (zero-order-
    hold controls), matching a ``lax.scan`` of ``rigid_body_rk4_step``."""
    interpret = _resolve_interpret(interpret)
    n = controls.shape[0]
    x_row = jnp.zeros((1, 16), jnp.float32).at[0, 0:12].set(
        x0.astype(jnp.float32))
    u_rows = jnp.zeros((n, 8), jnp.float32).at[:, 0:4].set(
        controls.astype(jnp.float32))
    res_rows = jnp.zeros((n, 16), jnp.float32)
    if residuals is not None:
        res_rows = res_rows.at[:, 0:12].set(residuals.astype(jnp.float32))
    out = _rollout_call(
        x_row, u_rows, res_rows, n, float(dt), int(substeps),
        float(params.mass), float(params.gravity),
        float(params.k_drag_linear), float(params.k_drag_angular),
        (float(params.inertia_xx), float(params.inertia_yy),
         float(params.inertia_zz)),
        tuple(float(v) for v in params.wind),
        interpret,
    )
    return out[:, 0:12]


def rigid_body_rk4_step_fused(
    state: jnp.ndarray,                 # (12,)
    control: jnp.ndarray,               # (4,)
    params: RigidBodyParams,
    dt: float,
    substeps: int = 1,
    residual: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One RK4 plant step (optionally substepped) as a single kernel —
    drop-in for ``models.rigid_body_rk4_step`` on the latency-sensitive
    per-tick paths (~44 us XLA -> single dispatch)."""
    res = None if residual is None else residual[None, :]
    out = rigid_body_rollout_fused(
        state, control[None, :], params, dt, substeps=substeps,
        residuals=res, interpret=interpret,
    )
    return out[0]


def rigid_body_rk4_step_fast(
    state: jnp.ndarray,
    control: jnp.ndarray,
    params: RigidBodyParams,
    dt: float,
    substeps: int = 1,
    residual: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Backend-aware plant step: the fused kernel on TPU (0.6 us vs 44 us
    staged), the plain XLA step elsewhere (CPU/GPU — interpret mode would
    be slower than XLA). Semantics identical either way."""
    if jax.default_backend() != "tpu":
        from ..models.rigid_body import rigid_body_rk4_step

        x = state
        for _ in range(substeps):
            x = rigid_body_rk4_step(
                x, control, params, dt / substeps, residual=residual)
        return x
    return rigid_body_rk4_step_fused(
        state, control, params, dt, substeps=substeps,
        residual=residual, interpret=False,
    )
