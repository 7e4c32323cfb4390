"""Fused MPPI rollout+cost kernel: all K sampled rollouts in one dispatch.

MPPI's tick is a vmapped ``lax.scan`` of the XLA RK4 plant — N sequential
steps, each a swarm of tiny batched HLO ops, the same serial-dispatch
anatomy that bounded the per-tick 12-state rows before the plant kernel
(``ops.rigid_plant_pallas``) and the iLQR solve before kernel rollouts.
This kernel runs the WHOLE sampling stage — K rollouts x N RK4 steps plus
the per-stage tracking cost — as one Pallas dispatch of vector arithmetic:
each of the 12 state components is a ``(K//128, 128)`` block (samples in
lanes), so the scalar plant math of the single-trajectory kernel becomes
elementwise vector math over all samples at once; only the cost vector
``(K,)`` leaves the kernel (the softmax/update stays in XLA, where it is
one cheap fused reduction).

Math is IDENTICAL to ``MPPIController._rollout_cost`` (RK4 of
``models.rigid_body.rigid_body_derivative`` — reference semantics
``quadrotor_dynamics.py:148-228`` — plus the stage/terminal tracking
cost); parity is pinned in ``tests/test_mppi.py`` (interpret mode) and
``tests_tpu/test_kernels_tpu.py`` (Mosaic-compiled).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.params import RigidBodyParams

_PI = 3.141592653589793


def _make_mppi_kernel(n_steps, sub, dt, mass, gravity, k_lin, k_ang,
                      inertia, wind, u_hover, weights):
    # the SAME in-kernel plant math as the single-trajectory rollout
    # kernel — each operand a (sub, 128) sample block instead of a scalar
    from .rigid_plant_pallas import make_plant_math

    _, rk4 = make_plant_math(dt, mass, gravity, k_lin, k_ang, inertia, wind)
    uh = tuple(float(v) for v in u_hover)
    (q_pos, q_vel, q_att, q_yaw, q_rate, r0, r1, r2, r3,
     terminal_weight) = (float(v) for v in weights)

    def stage_cost(s, u, tx, ty, tz, yaw):
        ex, ey, ez = s[0] - tx, s[1] - ty, s[2] - tz
        du0, du1 = u[0] - uh[0], u[1] - uh[1]
        du2, du3 = u[2] - uh[2], u[3] - uh[3]
        dyaw = (s[8] - yaw + _PI) % (2.0 * _PI) - _PI
        return (
            q_pos * (ex * ex + ey * ey + ez * ez)
            + q_vel * (s[3] * s[3] + s[4] * s[4] + s[5] * s[5])
            + q_att * (s[6] * s[6] + s[7] * s[7])
            + q_yaw * dyaw * dyaw
            + q_rate * (s[9] * s[9] + s[10] * s[10] + s[11] * s[11])
            + r0 * du0 * du0 + r1 * du1 * du1
            + r2 * du2 * du2 + r3 * du3 * du3
        )

    def kernel(x_ref, u_ref, t_ref, c_out_ref):
        s0 = tuple(
            jnp.full((sub, 128), x_ref[0, i], jnp.float32) for i in range(12)
        )
        c0 = jnp.zeros((sub, 128), jnp.float32)

        def one_step(i, carry):
            s = carry[:12]
            c = carry[12]
            ub = u_ref[pl.ds(i * 4 * sub, 4 * sub), :]
            u = tuple(ub[j * sub:(j + 1) * sub, :] for j in range(4))
            t_row = t_ref[pl.ds(i, 1), :]
            tx, ty, tz, yaw = (t_row[0, 0], t_row[0, 1],
                               t_row[0, 2], t_row[0, 3])
            s = rk4(s, u)
            c = c + stage_cost(s, u, tx, ty, tz, yaw)
            return s + (c,)

        fin = jax.lax.fori_loop(0, n_steps, one_step, s0 + (c0,))
        s, c = fin[:12], fin[12]
        t_last = t_ref[pl.ds(n_steps - 1, 1), :]
        ex = s[0] - t_last[0, 0]
        ey = s[1] - t_last[0, 1]
        ez = s[2] - t_last[0, 2]
        c = c + (terminal_weight - 1.0) * (
            q_pos * (ex * ex + ey * ey + ez * ez)
            + q_vel * (s[3] * s[3] + s[4] * s[4] + s[5] * s[5])
        )
        c_out_ref[:, :] = c

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "sub", "dt", "mass", "gravity", "k_lin",
                     "k_ang", "inertia", "wind", "u_hover", "weights",
                     "interpret"),
)
def _mppi_call(x_row, u_blk, t_rows, n_steps, sub, dt, mass, gravity,
               k_lin, k_ang, inertia, wind, u_hover, weights, interpret):
    base = _make_mppi_kernel(
        n_steps, sub, dt, mass, gravity, k_lin, k_ang, inertia, wind,
        u_hover, weights,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        base,
        out_shape=jax.ShapeDtypeStruct((sub, 128), jnp.float32),
        in_specs=[vmem] * 3,
        out_specs=vmem,
        interpret=interpret,
    )(x_row, u_blk, t_rows)


def mppi_rollout_costs_fused(
    x0: jnp.ndarray,          # (12,)
    U_cand: jnp.ndarray,      # (K, N, 4) clipped candidate sequences
    targets: jnp.ndarray,     # (N, 3) per-stage positions
    target_yaw,               # scalar
    params: RigidBodyParams,
    dt: float,
    u_hover: jnp.ndarray,     # (4,)
    weights: tuple,           # (q_pos,q_vel,q_att,q_yaw,q_rate,r0..r3,term_w)
    interpret: bool | None = None,
) -> jnp.ndarray:
    """All K MPPI rollout costs in one kernel dispatch; returns ``(K,)``.

    ``K`` must be a multiple of 128 (samples fill the lane dimension).
    Physics/cost constants are compile-time; ``x0``/``U_cand``/``targets``/
    ``target_yaw`` are runtime operands, so per-tick re-dispatch does not
    recompile.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    K, N, _ = U_cand.shape
    if K % 128:
        raise ValueError(f"num_samples={K} must be a multiple of 128")
    sub = K // 128
    x_row = jnp.zeros((1, 16), jnp.float32).at[0, 0:12].set(
        x0.astype(jnp.float32))
    # (K, N, 4) -> per step a (4*sub, 128) block: channel-major rows,
    # sample index = row_within_channel * 128 + lane
    u_blk = (U_cand.astype(jnp.float32)
             .reshape(sub, 128, N, 4)
             .transpose(2, 3, 0, 1)          # (N, 4, sub, 128)
             .reshape(N * 4 * sub, 128))
    t_rows = jnp.zeros((N, 8), jnp.float32)
    t_rows = t_rows.at[:, 0:3].set(targets.astype(jnp.float32))
    t_rows = t_rows.at[:, 3].set(jnp.asarray(target_yaw, jnp.float32))
    out = _mppi_call(
        x_row, u_blk, t_rows, int(N), int(sub), float(dt),
        float(params.mass), float(params.gravity),
        float(params.k_drag_linear), float(params.k_drag_angular),
        (float(params.inertia_xx), float(params.inertia_yy),
         float(params.inertia_zz)),
        tuple(float(v) for v in params.wind),
        # np.asarray first: iterating a device array inside a jit trace
        # turns each element into a tracer (index ops on constants), while
        # a whole-array fetch of a closure constant stays concrete
        tuple(float(v) for v in _np.asarray(u_hover)),
        tuple(float(v) for v in weights),
        bool(interpret),
    )
    return out.reshape(K)
