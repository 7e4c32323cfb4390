"""Pallas TPU kernel: the ENTIRE GP-MPC control tick in one dispatch.

Latency mode's endgame (VERDICT round 1, next-step #6): the closed-loop tick
previously dispatched two Pallas kernels (condensed-QP controller, then
allocation + plant) plus XLA glue for the warm-start shift and clips. Each
extra dispatch and glue op costs ~1-3 us on a v5e tick whose useful work is
~10 us of ADMM — so everything between "state + GP disturbance + reference"
and "next state" now lives in ONE kernel:

    z, y   <- Shift' z, y                  (warm-start shift as a 0/1 matmul)
    offset = Sx x0 + Sw w                  (prediction offset)
    f      = Su'Q (offset - ref)           (condensed gradient)
    ADMM loop (operator-composed, one (m, m) matvec per iteration)
    U      = M^-1(-f + G'(rho z - y))      (final primal)
    X_tail = offset + Su U                 (predicted trajectory)
    u0 clips -> geometric allocation + attitude PID (scalar section)
    plant RK4 substeps (rate-tracking PX4 surrogate)

Static matrices ride the ``controller_pallas`` padded layouts; the plant
section reuses the scalar transcriptions from ``plant_pallas``. Bit-level
semantics match running the three stages separately (the shift matmul is a
0/1 permutation — exact in f32).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .controller_pallas import FusedControllerData
from .plant_pallas import _allocation, _axpy, _derivative


class FusedTickData(NamedTuple):
    ctrl: FusedControllerData
    ShiftT: np.ndarray  # (m_pad, m_pad) warm-start shift, row form (z @ ShiftT)
    SxSwT: np.ndarray   # (2 n_pad, n_pad) = vstack(SxT, SwT): offset in 1 dot
    PM: np.ndarray      # (n_pad, m_pad + n_pad) = [P0mat | MinvT]: 1 dot
    Nnu: int            # N * nu (off_z lane offset; static)
    Nnx: int            # N * nx


def build_tick_data(ctrl: FusedControllerData, N: int, nu: int, nx: int) -> FusedTickData:
    """Stack the controller matrices into the tick kernel's wide layouts
    (fewer, larger MXU dots per tick: 10 -> 6)."""
    m_pad = ctrl.P1.shape[0]
    return FusedTickData(
        ctrl=ctrl,
        ShiftT=build_shift_matrix(N, nu, nx, m_pad),
        SxSwT=np.concatenate([ctrl.SxT, ctrl.SwT], axis=0),
        PM=np.concatenate([ctrl.P0mat, ctrl.MinvT], axis=1),
        Nnu=N * nu,
        Nnx=N * nx,
    )


def build_shift_matrix(N: int, nu: int, nx: int, m_pad: int) -> np.ndarray:
    """Row-form shift operator: ``z_new = z_old @ ShiftT`` rolls each stage
    block one stage forward and duplicates the last stage — the condensed
    analogue of the reference's shifted-solution warm start
    (``src/px4/mpc.py:1632-1646``)."""

    def block(width):
        n = N * width
        S = np.zeros((n, n), np.float32)
        for i in range((N - 1) * width):
            S[i, i + width] = 1.0       # new[k] = old[k+1]
        for i in range((N - 1) * width, n):
            S[i, i] = 1.0               # new[N-1] = old[N-1]
        return S.T                       # row form

    out = np.zeros((m_pad, m_pad), np.float32)
    out[: N * nu, : N * nu] = block(nu)
    out[N * nu : N * (nu + nx), N * nu : N * (nu + nx)] = block(nx)
    return out


def _make_tick_kernel(iterations, over_relax, rho,
                      mass, gravity, k_drag_linear, taus, thrust_gain,
                      dt, substeps, accel_lo, accel_hi, yawrate_limit,
                      loop_precision=jax.lax.Precision.HIGHEST):
    def _dot(prec):
        def dot(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        return dot

    dot = _dot(jax.lax.Precision.HIGHEST)
    dot_loop = _dot(loop_precision)

    def kernel(state_ref, w_ref, ref_ref, misc_ref, z0_ref, y0_ref,
               sxswt_ref, sutqt_ref, sut_ref,
               p1_ref, pm_ref, p0matt_ref,
               ulo_ref, uhi_ref, xlo_ref, xhi_ref, shiftt_ref,
               out_ref, z_ref, y_ref, u_ref, xtail_ref,
               *, Nnu, Nnx):
        m_pad = p1_ref.shape[0]
        # ---- warm-start shift: both rows through one permutation dot ------
        zy = dot(
            jnp.concatenate([z0_ref[:], y0_ref[:]], axis=0), shiftt_ref[:]
        )
        z0, y0 = zy[0:1], zy[1:2]

        # ---- condensed gradient / bounds (stacked wide dots) --------------
        xw = jnp.concatenate([state_ref[:], w_ref[:]], axis=1)  # (1, 2n)
        offset = dot(xw, sxswt_ref[:])                          # (1, n)
        f = dot(offset - ref_ref[:], sutqt_ref[:])              # (1, n)
        # off_z is a pure lane embedding of offset into the z layout —
        # no matmul needed
        off_z = jnp.concatenate(
            [
                jnp.zeros((1, Nnu), jnp.float32),
                offset[:, :Nnx],
                jnp.zeros((1, m_pad - Nnu - Nnx), jnp.float32),
            ],
            axis=1,
        )
        lower = ulo_ref[:] + xlo_ref[:] - off_z
        upper = uhi_ref[:] + xhi_ref[:] - off_z

        pm = dot(f, pm_ref[:])                                  # (1, m + n)
        p0 = -pm[:, :m_pad]
        minv_f = pm[:, m_pad:]
        P1 = p1_ref[:]

        def body(_, carry):
            z, y = carry
            GU = p0 + dot_loop(rho * z - y, P1)
            Gt = over_relax * GU + (1.0 - over_relax) * z
            z_new = jnp.clip(Gt + y / rho, lower, upper)
            y_new = y + rho * (Gt - z_new)
            return (z_new, y_new)

        z_fin, y_fin = jax.lax.fori_loop(0, iterations, body, (z0, y0))
        U = -minv_f + dot(rho * z_fin - y_fin, p0matt_ref[:])  # (1, n)
        X_tail = offset + dot(U, sut_ref[:])

        # ---- u0 clips + allocation + plant (scalar section) ---------------
        # controls from the slack's U-block: box-feasible at every iteration
        ax = jnp.clip(z_fin[0, 0], accel_lo[0], accel_hi[0])
        ay = jnp.clip(z_fin[0, 1], accel_lo[1], accel_hi[1])
        az = jnp.clip(z_fin[0, 2], accel_lo[2], accel_hi[2])
        yr = jnp.clip(z_fin[0, 3], -yawrate_limit, yawrate_limit)
        yaw_ref = misc_ref[0, 0]
        integral = (misc_ref[0, 1], misc_ref[0, 2], misc_ref[0, 3])

        s = tuple(state_ref[0, i] for i in range(12))
        c, att_sp, new_int = _allocation(
            s, (ax, ay, az, yr, yaw_ref), integral, dt, gravity
        )

        h = dt / substeps
        for _ in range(substeps):
            k1 = _derivative(s, c, mass, gravity, k_drag_linear, taus, thrust_gain)
            k2 = _derivative(_axpy(s, k1, 0.5 * h), c, mass, gravity,
                             k_drag_linear, taus, thrust_gain)
            k3 = _derivative(_axpy(s, k2, 0.5 * h), c, mass, gravity,
                             k_drag_linear, taus, thrust_gain)
            k4 = _derivative(_axpy(s, k3, h), c, mass, gravity,
                             k_drag_linear, taus, thrust_gain)
            s = tuple(
                s[i] + (h / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i])
                for i in range(12)
            )

        # packed output row: state(0:12) | control(12:16) | att_sp(16:19) |
        # integral(19:22) | accel_cmd(22:25)
        zero = jnp.float32(0.0)
        n_lanes = out_ref.shape[1]
        out_ref[:] = jnp.stack(
            s + c + att_sp + new_int + (ax, ay, az)
            + (zero,) * (n_lanes - 25)
        ).reshape(1, n_lanes)
        z_ref[:] = z_fin
        y_ref[:] = y_fin
        u_ref[:] = U
        xtail_ref[:] = X_tail

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "over_relax", "rho", "mass", "gravity",
        "k_drag_linear", "taus", "thrust_gain", "dt", "substeps",
        "accel_lo", "accel_hi", "yawrate_limit", "interpret",
        "loop_precision", "nnu", "nnx",
    ),
)
def gpmpc_tick_fused(
    data: FusedTickData,
    state_row: jnp.ndarray,   # (1, n_pad) FULL 12-state in lanes 0:12
    w_row: jnp.ndarray,       # (1, n_pad) stacked dt*D disturbance
    ref_row: jnp.ndarray,     # (1, n_pad) stacked state reference
    misc_row: jnp.ndarray,    # (1, n_pad): [yaw_ref, integral(3)]
    z0: jnp.ndarray,          # (1, m_pad) UNshifted previous slack
    y0: jnp.ndarray,          # (1, m_pad) UNshifted previous dual
    rho: float,
    iterations: int,
    over_relax: float,
    mass: float,
    gravity: float,
    k_drag_linear: float,
    taus: tuple,
    thrust_gain: float,
    dt: float,
    substeps: int,
    accel_lo: tuple,
    accel_hi: tuple,
    yawrate_limit: float,
    interpret: bool = False,
    loop_precision: str = "highest",
    nnu: int = 0,   # N * nu — static lane offsets (pass data.Nnu)
    nnx: int = 0,   # N * nx
):
    """One whole GP-MPC tick. Returns ``(packed, z, y, U, X_tail)`` rows;
    ``packed`` lanes: state 0:12, control 12:16, att_sp 16:19,
    integral 19:22, accel_cmd 22:25."""
    ctrl = data.ctrl
    m_pad = ctrl.P1.shape[0]
    n_pad = ctrl.SxT.shape[0]
    base = _make_tick_kernel(
        iterations, over_relax, rho, mass, gravity, k_drag_linear, taus,
        thrust_gain, dt, substeps, accel_lo, accel_hi, yawrate_limit,
        loop_precision=(jax.lax.Precision.DEFAULT
                        if loop_precision == "default"
                        else jax.lax.Precision.HIGHEST),
    )
    kernel = functools.partial(base, Nnu=nnu, Nnx=nnx)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ),
        in_specs=[vmem] * 17,
        out_specs=(vmem,) * 5,
        interpret=interpret,
    )(
        state_row, w_row, ref_row, misc_row, z0, y0,
        data.SxSwT, ctrl.SuTqT, ctrl.SuT,
        ctrl.P1, data.PM, ctrl.P0matT,
        ctrl.u_lo_row, ctrl.u_hi_row, ctrl.x_lo_row, ctrl.x_hi_row,
        data.ShiftT,
    )


# ---------------------------------------------------------------------------
# Multi-tick kernel: K whole GP-MPC ticks per dispatch, GP posterior included
# ---------------------------------------------------------------------------


class GPRows(NamedTuple):
    """Traced GP-posterior operands in kernel layouts (built once per flight
    by ``build_gp_rows`` — NOT per tick)."""

    ztrT: jnp.ndarray      # (16, P) length-scaled training inputs, transposed
    sq2_row: jnp.ndarray   # (1, P)  per-training-point squared norms
    alpha_s: jnp.ndarray   # (P, 8)  alpha * y_std (cols 0:6)
    y_mean_row: jnp.ndarray  # (1, 8) target means (cols 0:6)
    inv_ls_row: jnp.ndarray  # (1, 16) 1/length_scale per input lane (0:10)
    scal_row: jnp.ndarray  # (1, 8): [signal_variance, residual_gain, 0...]


def build_gp_rows(
    posterior, gain: float, control_dt: float = 0.02, gp_dt: float = 0.02,
    dtype=jnp.float32,
) -> GPRows:
    """Pack a ``gp.exact_gp.GPPosterior`` for the multi-tick kernel.

    The kernel reproduces ``gp.residual_gp.build_horizon_residuals`` +
    the ``w = control_dt * D`` conversion of the fused-tick rollout:
    ``w[k, 3:6] = gain * (control_dt / gp_dt) * posterior_mean[k, 3:6]``
    (``gp_dt`` is ``ResidualGPConfig.dt``, the residual-capture interval;
    at the default 50 Hz both dts are 0.02 and the ratio is 1)."""
    X = posterior.X_train.astype(dtype)          # (P, 10)
    P, d = X.shape
    ls = jnp.broadcast_to(
        jnp.asarray(posterior.params.length_scale, dtype), (d,)
    )
    Z = X / ls
    ztrT = jnp.zeros((16, P), dtype).at[:d, :].set(Z.T)
    sq2_row = jnp.sum(Z * Z, axis=1)[None, :]
    alpha_s = jnp.zeros((P, 8), dtype).at[:, :6].set(
        posterior.alpha.astype(dtype) * posterior.y_std.astype(dtype)[None, :]
    )
    y_mean_row = jnp.zeros((1, 8), dtype).at[0, :6].set(
        posterior.y_mean.astype(dtype)
    )
    inv_ls_row = jnp.zeros((1, 16), dtype).at[0, :d].set(1.0 / ls)
    scal_row = jnp.zeros((1, 8), dtype).at[0, 0].set(
        jnp.asarray(posterior.params.signal_variance, dtype)
    ).at[0, 1].set(jnp.asarray(gain * (control_dt / gp_dt), dtype))
    return GPRows(ztrT, sq2_row, alpha_s, y_mean_row, inv_ls_row, scal_row)


def _make_multitick_kernel(k_ticks, N, nu, nx, use_gp,
                           iterations, over_relax, rho,
                           mass, gravity, k_drag_linear, taus, thrust_gain,
                           dt, substeps, accel_lo, accel_hi, yawrate_limit,
                           loop_precision=jax.lax.Precision.HIGHEST):
    def _dot(prec):
        def dot(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        return dot

    dot = _dot(jax.lax.Precision.HIGHEST)
    dot_loop = _dot(loop_precision)
    Nnu, Nnx = N * nu, N * nx

    def kernel(state_ref, aux_ref, xtail_ref, z0_ref, y0_ref, refs_ref,
               ztrT_ref, sq2_ref, alphas_ref, ymean_ref, invls_ref, scal_ref,
               sxswt_ref, sutqt_ref, sut_ref,
               p1_ref, pm_ref, p0matt_ref,
               ulo_ref, uhi_ref, xlo_ref, xhi_ref, shiftt_ref,
               out_ref, state_out_ref, aux_out_ref, xtail_out_ref,
               z_ref, y_ref):
        m_pad = p1_ref.shape[0]
        n_pad = sut_ref.shape[0]
        zero = jnp.float32(0.0)

        def one_tick(t, carry):
            state_row, aux_row, xtail_row, z_prev, y_prev = carry
            ref_full = refs_ref[pl.ds(t, 1), :]            # (1, n_pad)
            yaw_ref = ref_full[0, n_pad - 1]
            ref_row = jnp.concatenate(
                [ref_full[:, :Nnx], jnp.zeros((1, n_pad - Nnx), jnp.float32)],
                axis=1,
            )

            # ---- GP horizon posterior (build_horizon_residuals) ---------
            # Row-layout carries hold the warm-start trajectory; the (N, 16)
            # feature matrix is assembled by scalar extraction (Mosaic has
            # no (1, N*nx) <-> (N, nx) relayout), like the plant section.
            if use_gp:
                def stage_features(k):
                    if k == 0:
                        xs = tuple(aux_row[0, d] for d in range(nx))
                    else:
                        xs = tuple(
                            xtail_row[0, (k - 1) * nx + d] for d in range(nx)
                        )
                    us = tuple(z_prev[0, k * nu + u] for u in range(nu))
                    return xs + us + (zero,) * (16 - nx - nu)

                F = jnp.stack(
                    [jnp.stack(stage_features(k)) for k in range(N)]
                )                                           # (N, 16)
                Zf = F * invls_ref[:]                       # broadcast row
                sq1 = jnp.sum(Zf * Zf, axis=1, keepdims=True)
                cross = dot(Zf, ztrT_ref[:])                # (N, P)
                dists = jnp.maximum(sq1 + sq2_ref[:] - 2.0 * cross, 0.0)
                sf2 = scal_ref[0, 0]
                gain = scal_ref[0, 1]
                Kst = sf2 * jnp.exp(-0.5 * dists)
                mean = dot(Kst, alphas_ref[:]) + ymean_ref[:]   # (N, 8)
                # w[6k + j] = gain * mean[k, j] for the accel rows j in 3:6
                w_scalars = []
                for k in range(N):
                    w_scalars.extend([zero, zero, zero])
                    w_scalars.extend(
                        gain * mean[k, 3 + j] for j in range(3)
                    )
                w_scalars.extend([zero] * (n_pad - Nnx))
                w_row = jnp.stack(w_scalars).reshape(1, n_pad)
            else:
                w_row = jnp.zeros((1, n_pad), jnp.float32)

            # ---- warm-start shift ----------------------------------------
            zy = dot(jnp.concatenate([z_prev, y_prev], axis=0), shiftt_ref[:])
            z0, y0 = zy[0:1], zy[1:2]

            # ---- condensed gradient / bounds -----------------------------
            xw = jnp.concatenate([state_row, w_row], axis=1)
            offset = dot(xw, sxswt_ref[:])
            f = dot(offset - ref_row, sutqt_ref[:])
            off_z = jnp.concatenate(
                [
                    jnp.zeros((1, Nnu), jnp.float32),
                    offset[:, :Nnx],
                    jnp.zeros((1, m_pad - Nnu - Nnx), jnp.float32),
                ],
                axis=1,
            )
            lower = ulo_ref[:] + xlo_ref[:] - off_z
            upper = uhi_ref[:] + xhi_ref[:] - off_z

            pm = dot(f, pm_ref[:])
            p0 = -pm[:, :m_pad]
            P1 = p1_ref[:]

            def body(_, zy_carry):
                z, y = zy_carry
                GU = p0 + dot_loop(rho * z - y, P1)
                Gt = over_relax * GU + (1.0 - over_relax) * z
                z_new = jnp.clip(Gt + y / rho, lower, upper)
                y_new = y + rho * (Gt - z_new)
                return (z_new, y_new)

            z_fin, y_fin = jax.lax.fori_loop(0, iterations, body, (z0, y0))
            U = -pm[:, m_pad:] + dot(rho * z_fin - y_fin, p0matt_ref[:])
            X_tail = offset + dot(U, sut_ref[:])

            # ---- u0 clips + allocation + plant (scalar section) ----------
            ax = jnp.clip(z_fin[0, 0], accel_lo[0], accel_hi[0])
            ay = jnp.clip(z_fin[0, 1], accel_lo[1], accel_hi[1])
            az = jnp.clip(z_fin[0, 2], accel_lo[2], accel_hi[2])
            yr = jnp.clip(z_fin[0, 3], -yawrate_limit, yawrate_limit)
            integral = (aux_row[0, 8], aux_row[0, 9], aux_row[0, 10])

            s = tuple(state_row[0, i] for i in range(12))
            c, att_sp, new_int = _allocation(
                s, (ax, ay, az, yr, yaw_ref), integral, dt, gravity
            )
            h = dt / substeps
            s_new = s
            for _ in range(substeps):
                k1 = _derivative(s_new, c, mass, gravity, k_drag_linear, taus,
                                 thrust_gain)
                k2 = _derivative(_axpy(s_new, k1, 0.5 * h), c, mass, gravity,
                                 k_drag_linear, taus, thrust_gain)
                k3 = _derivative(_axpy(s_new, k2, 0.5 * h), c, mass, gravity,
                                 k_drag_linear, taus, thrust_gain)
                k4 = _derivative(_axpy(s_new, k3, h), c, mass, gravity,
                                 k_drag_linear, taus, thrust_gain)
                s_new = tuple(
                    s_new[i]
                    + (h / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i])
                    for i in range(12)
                )

            # packed lanes: state 0:12 | control 12:16 | att_sp 16:19 |
            # integral 19:22 | accel 22:25 | u0 25:29 | vel_ref 29:32
            packed = jnp.stack(
                s + c + att_sp + new_int + (ax, ay, az)
                + (z_fin[0, 0], z_fin[0, 1], z_fin[0, 2], z_fin[0, 3])
                + (X_tail[0, 3], X_tail[0, 4], X_tail[0, 5])
                + (zero,) * (n_pad - 32)
            ).reshape(1, n_pad)
            out_ref[pl.ds(t, 1), :] = packed

            new_state_row = jnp.stack(
                s_new + (zero,) * (n_pad - 12)
            ).reshape(1, n_pad)
            # aux: prev x0 (this tick's pre-plant state) in 0:6, integral 8:11
            new_aux = jnp.stack(
                s[0:6] + (zero, zero) + new_int + (zero,) * (n_pad - 11)
            ).reshape(1, n_pad)
            return (new_state_row, new_aux, X_tail, z_fin, y_fin)

        init = (state_ref[:], aux_ref[:], xtail_ref[:], z0_ref[:], y0_ref[:])
        state_row, aux_row, xtail_row, z_fin, y_fin = jax.lax.fori_loop(
            0, k_ticks, one_tick, init
        )
        state_out_ref[:] = state_row
        aux_out_ref[:] = aux_row
        xtail_out_ref[:] = xtail_row
        z_ref[:] = z_fin
        y_ref[:] = y_fin

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_ticks", "use_gp", "iterations", "over_relax", "rho", "mass",
        "gravity", "k_drag_linear", "taus", "thrust_gain", "dt", "substeps",
        "accel_lo", "accel_hi", "yawrate_limit", "interpret",
        "loop_precision", "n", "nu", "nx",
    ),
)
def gpmpc_multitick_fused(
    data: FusedTickData,
    gp: GPRows | None,
    state_row: jnp.ndarray,    # (1, n_pad) 12-state in lanes 0:12
    aux_row: jnp.ndarray,      # (1, n_pad): prev x0 in 0:6, integral in 8:11
    xtail_row: jnp.ndarray,    # (1, n_pad) previous predicted X_tail (N*nx)
    z0: jnp.ndarray,           # (1, m_pad) UNshifted previous slack
    y0: jnp.ndarray,           # (1, m_pad) UNshifted previous dual
    refs: jnp.ndarray,         # (k_ticks, n_pad); lane n_pad-1 = yaw_ref
    k_ticks: int,
    use_gp: bool,
    rho: float,
    iterations: int,
    over_relax: float,
    mass: float,
    gravity: float,
    k_drag_linear: float,
    taus: tuple,
    thrust_gain: float,
    dt: float,
    substeps: int,
    accel_lo: tuple,
    accel_hi: tuple,
    yawrate_limit: float,
    interpret: bool = False,
    loop_precision: str = "highest",
    n: int = 0,    # horizon N
    nu: int = 4,
    nx: int = 6,
):
    """K whole GP-MPC ticks in ONE dispatch (GP horizon posterior included).

    Amortises per-tick dispatch + HBM->VMEM loads of the static matrices
    over ``k_ticks`` and keeps the GP posterior GEMMs on-die between ticks.
    Semantics per tick match ``gpmpc_tick_fused`` with the staged
    ``build_horizon_residuals`` GP hook (same feature construction from the
    previous solution, same ``w`` conversion).

    Returns ``(packed (k_ticks, n_pad), state_row, aux_row, xtail_row, z, y)``
    — packed lanes: state 0:12, control 12:16, att_sp 16:19, integral 19:22,
    accel_cmd 22:25, u_mpc 25:29, vel_ref 29:32.
    """
    ctrl = data.ctrl
    m_pad = ctrl.P1.shape[0]
    n_pad = ctrl.SxT.shape[0]
    base = _make_multitick_kernel(
        k_ticks, n, nu, nx, use_gp,
        iterations, over_relax, rho, mass, gravity, k_drag_linear, taus,
        thrust_gain, dt, substeps, accel_lo, accel_hi, yawrate_limit,
        loop_precision=(jax.lax.Precision.DEFAULT
                        if loop_precision == "default"
                        else jax.lax.Precision.HIGHEST),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    if gp is None:  # placeholder rows keep the arg list static
        gp = GPRows(
            ztrT=jnp.zeros((16, 8), jnp.float32),
            sq2_row=jnp.zeros((1, 8), jnp.float32),
            alpha_s=jnp.zeros((8, 8), jnp.float32),
            y_mean_row=jnp.zeros((1, 8), jnp.float32),
            inv_ls_row=jnp.zeros((1, 16), jnp.float32),
            scal_row=jnp.zeros((1, 8), jnp.float32),
        )
    return pl.pallas_call(
        base,
        out_shape=(
            jax.ShapeDtypeStruct((k_ticks, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
        ),
        in_specs=[vmem] * 23,
        out_specs=(vmem,) * 6,
        interpret=interpret,
    )(
        state_row, aux_row, xtail_row, z0, y0, refs,
        gp.ztrT, gp.sq2_row, gp.alpha_s, gp.y_mean_row, gp.inv_ls_row,
        gp.scal_row,
        data.SxSwT, ctrl.SuTqT, ctrl.SuT,
        ctrl.P1, data.PM, ctrl.P0matT,
        ctrl.u_lo_row, ctrl.u_hi_row, ctrl.x_lo_row, ctrl.x_hi_row,
        data.ShiftT,
    )
