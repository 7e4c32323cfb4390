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

Round-3 capability upgrades (VERDICT round-2 next-steps #1/#3/#4/#7):

* plant scalars (mass/drag/rate-lags/hover-thrust/WIND) are a traced
  ``(1, 16)`` row operand, not compile-time constants — dispersed plants and
  steady wind ride the fast path (Monte-Carlo ``vmap`` adds a grid axis);
* the controller can consume a separate *estimated* state row while the
  plant integrates the truth (the EKF-in-the-loop configuration);
* the multi-tick kernel optionally computes the GP posterior VARIANCE per
  horizon stage (cached-``K^{-1}`` quadratic form — algebraically equal to
  the ``L^-1 K_*`` solve of ``gp.exact_gp.predict``) and applies the
  zero-order back-off to the in-kernel state boxes
  (uncertainty-aware constraint tightening, arXiv:2211.15522; the variance
  the reference computes on every query, ``gaussian_process.py:223-233``).
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
from .plant_pallas import (
    _allocation,
    _axpy,
    _derivative,
    _jac_padded,
    _read_plant,
    _rk4_substeps,
)


class FusedTickData(NamedTuple):
    ctrl: FusedControllerData
    ShiftT: np.ndarray  # (m_pad, m_pad) warm-start shift, row form (z @ ShiftT)
    SxSwT: np.ndarray   # (2 n_pad, n_pad) = vstack(SxT, SwT): offset in 1 dot
    PM: np.ndarray      # (n_pad, m_pad + n_pad) = [P0mat | MinvT]: 1 dot
    SwSqT: np.ndarray   # (n_pad, n_pad) = SwT**2: disturbance-variance prop
    Nnu: int            # N * nu (off_z lane offset; static)
    Nnx: int            # N * nx


def build_tick_data(ctrl: FusedControllerData, N: int, nu: int, nx: int) -> FusedTickData:
    """Stack the controller matrices into the tick kernel's wide layouts
    (fewer, larger MXU dots per tick: 10 -> 6).

    Accepts host-NumPy controller data (flight path: baked XLA constants)
    or traced jnp arrays (the differentiable tuner path,
    ``ops.tick_ad.build_fused_controller_data_traced``)."""
    if not isinstance(ctrl.SxT, np.ndarray):
        from .tick_ad import build_tick_data_traced

        return build_tick_data_traced(ctrl, N, nu, nx)
    m_pad = ctrl.P1.shape[0]
    return FusedTickData(
        ctrl=ctrl,
        ShiftT=build_shift_matrix(N, nu, nx, m_pad),
        SxSwT=np.concatenate([ctrl.SxT, ctrl.SwT], axis=0),
        PM=np.concatenate([ctrl.P0mat, ctrl.MinvT], axis=1),
        SwSqT=np.asarray(ctrl.SwT, np.float32) ** 2,
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


def _warm_shift_rolls(zy, Nnu, Nnx, nu, nx, interpret):
    """Exact warm-start shift as two lane rolls + selects.

    Replaces the per-tick ``(2, m_pad) @ (m_pad, m_pad)`` permutation dot
    (HIGHEST = 6 MXU passes) with ~6 VPU ops: the U block advances by
    ``nu`` lanes, the X block by ``nx``, each duplicating its last stage,
    padding zeroed — bit-identical to ``z @ ShiftT`` (a 0/1 contraction of
    f32 values is exact in both forms)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, zy.shape, 1)
    if interpret:   # pltpu.roll has no interpret-mode lowering
        ru = jnp.roll(zy, -nu, axis=1)
        rx = jnp.roll(zy, -nx, axis=1)
    else:
        ru = pltpu.roll(zy, zy.shape[1] - nu, 1)
        rx = pltpu.roll(zy, zy.shape[1] - nx, 1)
    return jnp.where(
        lane < Nnu - nu, ru,
        jnp.where(
            lane < Nnu, zy,
            jnp.where(
                lane < Nnu + Nnx - nx, rx,
                jnp.where(lane < Nnu + Nnx, zy, 0.0),
            ),
        ),
    )


def _make_tick_kernel(iterations, over_relax, rho,
                      dt, substeps, accel_lo, accel_hi, yawrate_limit,
                      loop_precision=jax.lax.Precision.HIGHEST,
                      fallback_error_m=0.0, fallback_thrust_ceiling=1.5,
                      fallback_accel_scale=1.5,
                      nu=4, nx=6, interpret=False):
    def _dot(prec):
        def dot(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        return dot

    dot = _dot(jax.lax.Precision.HIGHEST)
    dot_loop = _dot(loop_precision)

    def kernel(state_ref, cstate_ref, w_ref, ref_ref, misc_ref, tight_ref,
               z0_ref, y0_ref, plant_ref,
               sxswt_ref, sutqt_ref, sut_ref,
               p1_ref, pm_ref, p0matt_ref,
               ulo_ref, uhi_ref, xlo_ref, xhi_ref,
               out_ref, z_ref, y_ref, u_ref, xtail_ref,
               *, Nnu, Nnx):
        m_pad = p1_ref.shape[0]
        plant = _read_plant(plant_ref)
        gravity = plant[1]
        # ---- warm-start shift: both rows via exact lane rolls -------------
        zy = _warm_shift_rolls(
            jnp.concatenate([z0_ref[:], y0_ref[:]], axis=0),
            Nnu, Nnx, nu, nx, interpret,
        )
        z0, y0 = zy[0:1], zy[1:2]

        # ---- condensed gradient / bounds (stacked wide dots) --------------
        # the CONTROLLER consumes cstate (the estimate when an EKF is in the
        # loop; == state otherwise); the plant section integrates the truth
        xw = jnp.concatenate([cstate_ref[:], w_ref[:]], axis=1)  # (1, 2n)
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
        # tight_ref: z-layout uncertainty back-off (zeros when disabled)
        lower = ulo_ref[:] + xlo_ref[:] + tight_ref[:] - off_z
        upper = uhi_ref[:] + xhi_ref[:] - tight_ref[:] - off_z

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

        # attitude PID sees the controller state (estimate); plant the truth
        sc = tuple(cstate_ref[0, i] for i in range(12))
        thrust_hi = jnp.float32(1.2)
        if fallback_error_m > 0.0:
            # divergence guard (mpc.py:2276-2282): fallback PD hover law on
            # the controller-visible state when tracking error explodes,
            # with recovery thrust headroom (diverged members are typically
            # pinned at the nominal 1.2 clamp and sink)
            ex = ref_ref[0, 0] - sc[0]
            ey = ref_ref[0, 1] - sc[1]
            ez = ref_ref[0, 2] - sc[2]
            diverged = ex * ex + ey * ey + ez * ez > fallback_error_m**2
            ks = fallback_accel_scale
            fb = lambda e, v, lo, hi: jnp.clip(1.5 * e - 0.8 * v,
                                               ks * lo, ks * hi)
            ax = jnp.where(diverged, fb(ex, sc[3], accel_lo[0], accel_hi[0]), ax)
            ay = jnp.where(diverged, fb(ey, sc[4], accel_lo[1], accel_hi[1]), ay)
            az = jnp.where(diverged, fb(ez, sc[5], accel_lo[2], accel_hi[2]), az)
            yr = jnp.where(diverged, 0.0, yr)
            thrust_hi = jnp.where(
                diverged, jnp.float32(fallback_thrust_ceiling), thrust_hi
            )
        c, att_sp, new_int = _allocation(
            sc, (ax, ay, az, yr, yaw_ref), integral, dt, gravity,
            thrust_ceiling=thrust_hi,
        )
        s = tuple(state_ref[0, i] for i in range(12))
        s = _rk4_substeps(s, c, plant, dt, substeps)

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
        "iterations", "over_relax", "rho", "dt", "substeps",
        "accel_lo", "accel_hi", "yawrate_limit", "interpret",
        "loop_precision", "nnu", "nnx", "nu", "nx", "fallback_error_m",
        "fallback_thrust_ceiling", "fallback_accel_scale",
    ),
)
def gpmpc_tick_fused(
    data: FusedTickData,
    state_row: jnp.ndarray,   # (1, n_pad) FULL 12-state in lanes 0:12 (truth)
    w_row: jnp.ndarray,       # (1, n_pad) stacked dt*D disturbance
    ref_row: jnp.ndarray,     # (1, n_pad) stacked state reference
    misc_row: jnp.ndarray,    # (1, n_pad): [yaw_ref, integral(3)]
    z0: jnp.ndarray,          # (1, m_pad) UNshifted previous slack
    y0: jnp.ndarray,          # (1, m_pad) UNshifted previous dual
    plant_row: jnp.ndarray,   # (1, 16) traced plant scalars (build_plant_row)
    rho: float,
    iterations: int,
    over_relax: float,
    dt: float,
    substeps: int,
    accel_lo: tuple,
    accel_hi: tuple,
    yawrate_limit: float,
    interpret: bool = False,
    loop_precision: str = "highest",
    nnu: int = 0,   # N * nu — static lane offsets (pass data.Nnu)
    nnx: int = 0,   # N * nx
    nu: int = 4,    # per-stage control width (warm-start lane-roll stride)
    nx: int = 6,    # per-stage state width
    fallback_error_m: float = 0.0,
    fallback_thrust_ceiling: float = 1.5,
    fallback_accel_scale: float = 1.5,
    ctrl_state_row: jnp.ndarray | None = None,  # estimate; None -> truth
    tight_row: jnp.ndarray | None = None,       # (1, m_pad) z-layout back-off
):
    """One whole GP-MPC tick. Returns ``(packed, z, y, U, X_tail)`` rows;
    ``packed`` lanes: state 0:12, control 12:16, att_sp 16:19,
    integral 19:22, accel_cmd 22:25.

    ``ctrl_state_row`` lets the controller fly an EKF ESTIMATE while the
    plant integrates the truth (``estimation.noisy_loop`` fused path);
    ``tight_row`` applies an uncertainty back-off to the state boxes
    (``LinearMPCConfig.tightening_factor``), both default to off."""
    ctrl = data.ctrl
    m_pad = ctrl.P1.shape[0]
    n_pad = ctrl.SxT.shape[0]
    if n_pad > 128 and not interpret:
        # the in-kernel scalar-lane packing (jnp.stack of per-lane scalars
        # into (1, n_pad) rows) only lowers within ONE 128-lane tile on
        # Mosaic ("Input offsets outside of the first tile" otherwise);
        # every shipped fused-path configuration uses horizon=20 (N*nx+1 =
        # 121 -> n_pad=128). Fail actionably instead of deep in Mosaic.
        raise ValueError(
            f"fused tick kernels support n_pad<=128 on TPU (got {n_pad}: "
            "horizon too long — use horizon<=21 for the 6-state model, or "
            "the staged path)"
        )
    base = _make_tick_kernel(
        iterations, over_relax, rho, dt, substeps,
        accel_lo, accel_hi, yawrate_limit,
        loop_precision=(jax.lax.Precision.DEFAULT
                        if loop_precision == "default"
                        else jax.lax.Precision.HIGHEST),
        fallback_error_m=fallback_error_m,
        fallback_thrust_ceiling=fallback_thrust_ceiling,
        fallback_accel_scale=fallback_accel_scale,
        nu=nu, nx=nx, interpret=interpret,
    )
    kernel = functools.partial(base, Nnu=nnu, Nnx=nnx)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    if ctrl_state_row is None:
        ctrl_state_row = state_row
    if tight_row is None:
        tight_row = jnp.zeros((1, m_pad), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ),
        in_specs=[vmem] * 19,
        out_specs=(vmem,) * 5,
        interpret=interpret,
    )(
        state_row, ctrl_state_row, w_row, ref_row, misc_row, tight_row,
        z0, y0, plant_row,
        data.SxSwT, ctrl.SuTqT, ctrl.SuT,
        ctrl.P1, data.PM, ctrl.P0matT,
        ctrl.u_lo_row, ctrl.u_hi_row, ctrl.x_lo_row, ctrl.x_hi_row,
    )


# ---------------------------------------------------------------------------
# Multi-tick kernel: K whole GP-MPC ticks per dispatch, GP posterior included
# ---------------------------------------------------------------------------


class GPRows(NamedTuple):
    """Traced GP-posterior operands in kernel layouts (rebuilt whenever the
    posterior changes — once per flight for a frozen GP, every refit for the
    ONLINE path, ``loop.closed_loop`` online mode)."""

    ztrT: jnp.ndarray      # (16, P) length-scaled training inputs, transposed
    sq2_row: jnp.ndarray   # (1, P)  per-training-point squared norms
    alpha_s: jnp.ndarray   # (P, 8)  alpha * y_std (cols 0:6)
    y_mean_row: jnp.ndarray  # (1, 8) target means (cols 0:6)
    # row 0: 1/length_scale per input lane (0:10); row 1: x_shift/ls — the
    # query centering of GPPosterior.x_shift (zeros for unshifted fits);
    # the kernel computes Zf = F * row0 - row1
    inv_ls_row: jnp.ndarray  # (2, 16)
    scal_row: jnp.ndarray  # (1, 8): [signal_variance, gain, prior_var, 0...]
    kinv: jnp.ndarray | None = None      # (P, P) K^{-1} (variance path only)
    y_std_row: jnp.ndarray | None = None  # (1, 8) y_std (variance path only)


def build_gp_rows(
    posterior, gain: float, control_dt: float = 0.02, gp_dt: float = 0.02,
    dtype=jnp.float32, with_variance: bool = False,
) -> GPRows:
    """Pack a ``gp.exact_gp.GPPosterior`` for the multi-tick kernel.

    The kernel reproduces ``gp.residual_gp.build_horizon_residuals`` +
    the ``w = control_dt * D`` conversion of the fused-tick rollout:
    ``w[k, 3:6] = gain * (control_dt / gp_dt) * posterior_mean[k, 3:6]``
    (``gp_dt`` is ``ResidualGPConfig.dt``, the residual-capture interval;
    at the default 50 Hz both dts are 0.02 and the ratio is 1).

    ``with_variance=True`` additionally caches ``K^{-1}`` (one extra
    ``cho_solve`` against the identity at build time) so the kernel can form
    the posterior variance as the quadratic ``prior - K_* K^{-1} K_*^T``
    diagonal — algebraically identical to the triangular-solve form of
    ``gp.exact_gp.predict`` (``include_noise_in_variance=True`` semantics:
    prior = signal + noise variance, matching sklearn RBF+White predict)."""
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
    inv_ls_row = jnp.zeros((2, 16), dtype).at[0, :d].set(1.0 / ls)
    if posterior.x_shift is not None:
        # X_train is stored centered; center queries by the same shift
        inv_ls_row = inv_ls_row.at[1, :d].set(
            posterior.x_shift.astype(dtype) / ls
        )
    sf2 = jnp.asarray(posterior.params.signal_variance, dtype)
    noise = jnp.asarray(posterior.params.noise_variance, dtype)
    scal_row = (
        jnp.zeros((1, 8), dtype)
        .at[0, 0].set(sf2)
        .at[0, 1].set(jnp.asarray(gain * (control_dt / gp_dt), dtype))
        .at[0, 2].set(sf2 + noise)
    )
    kinv = None
    y_std_row = None
    if with_variance:
        eye = jnp.eye(P, dtype=posterior.chol.dtype)
        kinv = jax.scipy.linalg.cho_solve(
            (posterior.chol, True), eye
        ).astype(dtype)
        y_std_row = jnp.zeros((1, 8), dtype).at[0, :6].set(
            posterior.y_std.astype(dtype)
        )
    return GPRows(ztrT, sq2_row, alpha_s, y_mean_row, inv_ls_row, scal_row,
                  kinv, y_std_row)


def _make_multitick_kernel(k_ticks, N, nu, nx, use_gp,
                           iterations, over_relax, rho,
                           dt, substeps, accel_lo, accel_hi, yawrate_limit,
                           loop_precision=jax.lax.Precision.HIGHEST,
                           tighten_kappa=0.0, fallback_error_m=0.0,
                           fallback_thrust_ceiling=1.5,
                           fallback_accel_scale=1.5, interpret=False):
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
    use_tightening = use_gp and tighten_kappa > 0.0

    def kernel(state_ref, aux_ref, xtail_ref, z0_ref, y0_ref, refs_ref,
               plant_ref,
               ztrT_ref, sq2_ref, alphas_ref, ymean_ref, invls_ref, scal_ref,
               *rest):
        if use_tightening:
            (kinv_ref, ystd_ref,
             sxswt_ref, sutqt_ref, sut_ref, swsqt_ref,
             p1_ref, pm_ref, p0matt_ref,
             ulo_ref, uhi_ref, xlo_ref, xhi_ref,
             out_ref, state_out_ref, aux_out_ref, xtail_out_ref,
             z_ref, y_ref) = rest
        else:
            (sxswt_ref, sutqt_ref, sut_ref,
             p1_ref, pm_ref, p0matt_ref,
             ulo_ref, uhi_ref, xlo_ref, xhi_ref,
             out_ref, state_out_ref, aux_out_ref, xtail_out_ref,
             z_ref, y_ref) = rest
        m_pad = p1_ref.shape[0]
        n_pad = sut_ref.shape[0]
        zero = jnp.float32(0.0)
        plant = _read_plant(plant_ref)
        gravity = plant[1]

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
            tight_z = jnp.zeros((1, m_pad), jnp.float32)
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
                # centered scaled features: row 0 = 1/ls, row 1 = shift/ls
                Zf = F * invls_ref[0:1, :] - invls_ref[1:2, :]
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

                if use_tightening:
                    # posterior variance via the cached-K^{-1} quadratic:
                    # var = prior - diag(K_* K^{-1} K_*^T); then the staged
                    # back-off algebra of LinearMPC.solve(uncertainty=...)
                    KK = dot_loop(Kst, kinv_ref[:])          # (N, P)
                    quad = jnp.sum(KK * Kst, axis=1, keepdims=True)  # (N,1)
                    var_lat = jnp.maximum(scal_ref[0, 2] - quad, 1e-10)
                    g2 = gain * gain
                    sig = []
                    for k in range(N):
                        sig.extend([zero, zero, zero])
                        sig.extend(
                            g2 * var_lat[k, 0]
                            * ystd_ref[0, 3 + j] * ystd_ref[0, 3 + j]
                            for j in range(3)
                        )
                    sig.extend([zero] * (n_pad - Nnx))
                    sig_row = jnp.stack(sig).reshape(1, n_pad)
                    var_x = dot(sig_row, swsqt_ref[:])       # (1, n_pad)
                    tight_x = tighten_kappa * jnp.sqrt(var_x)
                    tight_z = jnp.concatenate(
                        [
                            jnp.zeros((1, Nnu), jnp.float32),
                            tight_x[:, :Nnx],
                            jnp.zeros((1, m_pad - Nnu - Nnx), jnp.float32),
                        ],
                        axis=1,
                    )
                    # never invert a box: cap at 45% of its width (zero
                    # outside the x-block, so u-lanes stay untouched)
                    tight_z = jnp.minimum(
                        tight_z, 0.45 * (xhi_ref[:] - xlo_ref[:])
                    )
            else:
                w_row = jnp.zeros((1, n_pad), jnp.float32)

            # ---- warm-start shift (exact lane rolls) ----------------------
            zy = _warm_shift_rolls(
                jnp.concatenate([z_prev, y_prev], axis=0),
                Nnu, Nnx, nu, nx, interpret,
            )
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
            lower = ulo_ref[:] + xlo_ref[:] + tight_z - off_z
            upper = uhi_ref[:] + xhi_ref[:] - tight_z - off_z

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
            thrust_hi = jnp.float32(1.2)
            if fallback_error_m > 0.0:
                # divergence guard (mpc.py:2276-2282): fallback PD hover law
                # + recovery thrust headroom (see single-tick kernel note)
                ex = ref_row[0, 0] - s[0]
                ey = ref_row[0, 1] - s[1]
                ez = ref_row[0, 2] - s[2]
                diverged = ex * ex + ey * ey + ez * ez > fallback_error_m**2
                ks = fallback_accel_scale
                fb = lambda e, v, lo, hi: jnp.clip(1.5 * e - 0.8 * v,
                                                   ks * lo, ks * hi)
                ax = jnp.where(diverged, fb(ex, s[3], accel_lo[0], accel_hi[0]), ax)
                ay = jnp.where(diverged, fb(ey, s[4], accel_lo[1], accel_hi[1]), ay)
                az = jnp.where(diverged, fb(ez, s[5], accel_lo[2], accel_hi[2]), az)
                yr = jnp.where(diverged, 0.0, yr)
                thrust_hi = jnp.where(
                    diverged, jnp.float32(fallback_thrust_ceiling), thrust_hi
                )
            c, att_sp, new_int = _allocation(
                s, (ax, ay, az, yr, yaw_ref), integral, dt, gravity,
                thrust_ceiling=thrust_hi,
            )
            s_new = _rk4_substeps(s, c, plant, dt, substeps)

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
        "k_ticks", "use_gp", "iterations", "over_relax", "rho",
        "dt", "substeps", "accel_lo", "accel_hi", "yawrate_limit",
        "interpret", "loop_precision", "n", "nu", "nx", "tighten_kappa",
        "fallback_error_m", "fallback_thrust_ceiling",
        "fallback_accel_scale",
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
    plant_row: jnp.ndarray,    # (1, 16) traced plant scalars
    k_ticks: int,
    use_gp: bool,
    rho: float,
    iterations: int,
    over_relax: float,
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
    tighten_kappa: float = 0.0,
    fallback_error_m: float = 0.0,
    fallback_thrust_ceiling: float = 1.5,
    fallback_accel_scale: float = 1.5,
):
    """K whole GP-MPC ticks in ONE dispatch (GP horizon posterior included).

    Amortises per-tick dispatch + HBM->VMEM loads of the static matrices
    over ``k_ticks`` and keeps the GP posterior GEMMs on-die between ticks.
    Semantics per tick match ``gpmpc_tick_fused`` with the staged
    ``build_horizon_residuals`` GP hook (same feature construction from the
    previous solution, same ``w`` conversion). With ``tighten_kappa > 0``
    (and GP rows built ``with_variance=True``) the in-kernel GP also
    produces the stage-wise posterior variance and backs the state boxes
    off by ``kappa * sigma`` — the staged
    ``LinearMPC.solve(uncertainty=...)`` tightening, on the fast path.

    Returns ``(packed (k_ticks, n_pad), state_row, aux_row, xtail_row, z, y)``
    — packed lanes: state 0:12, control 12:16, att_sp 16:19, integral 19:22,
    accel_cmd 22:25, u_mpc 25:29, vel_ref 29:32.
    """
    ctrl = data.ctrl
    m_pad = ctrl.P1.shape[0]
    n_pad = ctrl.SxT.shape[0]
    if n_pad > 128 and not interpret:
        # the in-kernel scalar-lane packing (jnp.stack of per-lane scalars
        # into (1, n_pad) rows) only lowers within ONE 128-lane tile on
        # Mosaic ("Input offsets outside of the first tile" otherwise);
        # every shipped fused-path configuration uses horizon=20 (N*nx+1 =
        # 121 -> n_pad=128). Fail actionably instead of deep in Mosaic.
        raise ValueError(
            f"fused tick kernels support n_pad<=128 on TPU (got {n_pad}: "
            "horizon too long — use horizon<=21 for the 6-state model, or "
            "the staged path)"
        )
    use_tightening = use_gp and tighten_kappa > 0.0
    base = _make_multitick_kernel(
        k_ticks, n, nu, nx, use_gp,
        iterations, over_relax, rho, dt, substeps,
        accel_lo, accel_hi, yawrate_limit,
        loop_precision=(jax.lax.Precision.DEFAULT
                        if loop_precision == "default"
                        else jax.lax.Precision.HIGHEST),
        tighten_kappa=tighten_kappa,
        fallback_error_m=fallback_error_m,
        fallback_thrust_ceiling=fallback_thrust_ceiling,
        fallback_accel_scale=fallback_accel_scale,
        interpret=interpret,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    if gp is None:  # placeholder rows keep the arg list static
        gp = GPRows(
            ztrT=jnp.zeros((16, 8), jnp.float32),
            sq2_row=jnp.zeros((1, 8), jnp.float32),
            alpha_s=jnp.zeros((8, 8), jnp.float32),
            y_mean_row=jnp.zeros((1, 8), jnp.float32),
            inv_ls_row=jnp.zeros((2, 16), jnp.float32),
            scal_row=jnp.zeros((1, 8), jnp.float32),
        )
    if use_tightening and (gp.kinv is None or gp.y_std_row is None):
        raise ValueError(
            "tighten_kappa > 0 needs GP rows built with_variance=True "
            "(build_gp_rows(..., with_variance=True))"
        )
    var_ops = (gp.kinv, gp.y_std_row) if use_tightening else ()
    var_mats = (data.SwSqT,) if use_tightening else ()
    operands = (
        state_row, aux_row, xtail_row, z0, y0, refs, plant_row,
        gp.ztrT, gp.sq2_row, gp.alpha_s, gp.y_mean_row, gp.inv_ls_row,
        gp.scal_row,
        *var_ops,
        data.SxSwT, ctrl.SuTqT, ctrl.SuT, *var_mats,
        ctrl.P1, data.PM, ctrl.P0matT,
        ctrl.u_lo_row, ctrl.u_hi_row, ctrl.x_lo_row, ctrl.x_hi_row,
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
        in_specs=[vmem] * len(operands),
        out_specs=(vmem,) * 6,
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# Noisy multi-tick kernel: EKF + K whole MPC ticks per dispatch
# ---------------------------------------------------------------------------
#
# Estimation at the latency tier: the (12,12) EKF Riccati recursion runs
# INSIDE the multi-tick kernel — covariance as a padded (128,128) VMEM
# operand, measurement fusion as NINE sequential scalar updates (exact for
# the diagonal-R direct-state measurement model of ``estimation.ekf``: each
# update is rank-1, S is a scalar — no in-kernel matrix inverse needed; the
# broadcast form P <- P - (P[:,j]/S) P[j,:] preserves symmetry up to f32
# rounding, re-symmetrized per dispatch outside). The process Jacobian F is
# relinearised PER TICK in-kernel from the hand-derived analytic Jacobian
# (``plant_pallas._jac_padded``, the scalar transcription of
# ``px4_surrogate.derivative_jacobian``) chained exactly through the RK4
# stages — the same chain rule as ``jax.jacfwd`` of the step, so the
# rounds-2/3 per-dispatch frozen-F approximation is GONE: the in-kernel
# filter now computes the same F as the staged ``ekf_step`` up to f32
# rounding (parity pinned at K=20 in ``tests/test_estimation.py``).
#
# MAINTENANCE NOTE: the ADMM/allocation/plant blocks deliberately mirror
# ``_make_multitick_kernel`` (GP/tightening excluded here — the noisy tier
# is gated to the plain-MPC configuration); changes there must be mirrored.

EKF_MEAS_IDX = (0, 1, 2, 6, 7, 8, 9, 10, 11)  # estimation.ekf.MEASURED_IDX
PK = 128  # covariance pad (P, F, Q live as (PK, PK) operands)


def build_dob_bdist(dt: float, pk: int = PK) -> jnp.ndarray:
    """The d-injection block of the augmented transition Jacobian.

    ``d(aug_step)/d(d)`` for ``estimation.disturbance.dekf_step``'s process
    model (disturbance injected AFTER the nominal step): ``0.5 dt^2`` on the
    position rows, ``dt`` on the velocity rows, zero elsewhere — F_aug =
    I + Fd12 + bdist, exactly ``jacfwd(aug_step)``'s extra columns."""
    b = np.zeros((pk, pk), np.float32)
    for j in range(3):
        b[j, 12 + j] = 0.5 * dt * dt
        b[3 + j, 12 + j] = dt
    return jnp.asarray(b)


def _make_noisy_multitick_kernel(k_ticks, N, nu, nx, use_gp,
                                 iterations, over_relax, rho,
                                 dt, substeps, accel_lo, accel_hi,
                                 yawrate_limit,
                                 loop_precision=jax.lax.Precision.HIGHEST,
                                 fallback_error_m=0.0,
                                 fallback_thrust_ceiling=1.5,
                                 fallback_accel_scale=1.5, interpret=False,
                                 relin_per_tick=True,
                                 cov_precision=jax.lax.Precision.HIGHEST,
                                 use_dob=False):
    def _dot(prec):
        def dot(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        return dot

    dot = _dot(jax.lax.Precision.HIGHEST)
    dot_loop = _dot(loop_precision)
    # covariance-propagation dots (the RK4 Jacobian chain + F P F'):
    # optionally bf16 single-pass — P's conditioning is regularised every
    # tick by the Q addition and the scalar-fusion update stays f32, so the
    # bf16 rounding shows up as bounded estimate noise, not PSD collapse
    # (drift bounded at K=8 AND K=20 in tests/test_estimation.py)
    dot_cov = _dot(cov_precision)
    Nnu, Nnx = N * nu, N * nx
    two_pi = 2.0 * jnp.pi

    def kernel(state_ref, est_ref, p_ref, aux_ref, xtail_ref, z0_ref, y0_ref,
               refs_ref, noise_ref, plant_ref, qmat_ref, rdiag_ref,
               nom_ref, bdist_ref,
               ztrT_ref, sq2_ref, alphas_ref, ymean_ref, invls_ref, scal_ref,
               sxswt_ref, sutqt_ref, sut_ref,
               p1_ref, pm_ref, p0matt_ref,
               ulo_ref, uhi_ref, xlo_ref, xhi_ref,
               out_ref, state_out_ref, est_out_ref, p_out_ref,
               aux_out_ref, xtail_out_ref, z_ref, y_ref):
        m_pad = p1_ref.shape[0]
        n_pad = sut_ref.shape[0]
        zero = jnp.float32(0.0)
        # plant operand: (1, 16) = constant plant, or (k_ticks, 16) =
        # PER-TICK rows (time-varying wind, the staged loop's wind_fn
        # semantics — gusts at the latency tier); only the wind lanes vary,
        # so gravity/mass may come from row 0
        plant_rows = plant_ref.shape[0]
        plant0 = _read_plant(plant_ref)
        gravity = plant0[1]
        Qmat = qmat_ref[:]
        # Disturbance-observer mode (estimation.disturbance at the latency
        # tier): the filter PREDICTS with the NOMINAL plant row — the
        # innovation the nominal model cannot explain is attributed to the
        # augmented random-walk acceleration d (est lanes 12:15) — while the
        # in-kernel plant keeps integrating the TRUE row. bdist_ref holds the
        # exact d-injection Jacobian block (d(x')/d(d): 0.5 dt^2 on position
        # rows, dt on velocity rows), so F_aug = I + Fd12 + bdist — the same
        # jacfwd(aug_step) the staged dekf_step computes.
        nom_plant = _read_plant(nom_ref) if use_dob else None

        def plant_at(t):
            if plant_rows == 1:
                return plant0
            prow = plant_ref[pl.ds(t, 1), :]
            return tuple(prow[0, i] for i in range(len(plant0)))

        def _fd_chain(ex, prev_c, x2, x3, x4, ekf_plant):
            # transition Jacobian F = I + Fd with
            # Fd = h/6 (K1 + 2K2 + 2K3 + K4), K_{i+1} = J(x_i)(I + c_i h K_i)
            # — the exact RK4 chain rule (px4_step_jacobian) from the
            # hand-derived analytic J at the given stage states (of the
            # FILTER's process model: the nominal row in observer mode)
            K1 = _jac_padded(ex, prev_c, ekf_plant, PK)
            J2 = _jac_padded(x2, prev_c, ekf_plant, PK)
            J3 = _jac_padded(x3, prev_c, ekf_plant, PK)
            J4 = _jac_padded(x4, prev_c, ekf_plant, PK)
            K2 = J2 + 0.5 * dt * dot_cov(J2, K1)
            K3 = J3 + 0.5 * dt * dot_cov(J3, K2)
            K4 = J4 + dt * dot_cov(J4, K3)
            Fd = (dt / 6.0) * (K1 + 2.0 * K2 + 2.0 * K3 + K4)
            if use_dob:
                Fd = Fd + bdist_ref[:]
            return Fd

        if not relin_per_tick:
            # "dispatch" cadence: linearise ONCE at the dispatch-entry
            # estimate/control and reuse Fd for all k_ticks ticks — drops
            # 4 Jacobian builds + 3 (PK,PK) HIGHEST matmuls per tick; the
            # state PREDICTION itself stays per-tick exact, only the
            # covariance propagation sees the frozen F
            ekf_pl0 = nom_plant if use_dob else plant0
            ex0 = tuple(est_ref[0, i] for i in range(12))
            c0 = tuple(aux_ref[0, 11 + i] for i in range(4))
            k1_0 = _derivative(ex0, c0, ekf_pl0)
            x2_0 = _axpy(ex0, k1_0, 0.5 * dt)
            k2_0 = _derivative(x2_0, c0, ekf_pl0)
            x3_0 = _axpy(ex0, k2_0, 0.5 * dt)
            k3_0 = _derivative(x3_0, c0, ekf_pl0)
            x4_0 = _axpy(ex0, k3_0, dt)
            fd_frozen = _fd_chain(ex0, c0, x2_0, x3_0, x4_0, ekf_pl0)
        else:
            fd_frozen = None

        def one_tick(t, carry):
            state_row, est_row, P, aux_row, xtail_row, z_prev, y_prev = carry
            ref_full = refs_ref[pl.ds(t, 1), :]
            yaw_ref = ref_full[0, n_pad - 1]
            ref_row = jnp.concatenate(
                [ref_full[:, :Nnx], jnp.zeros((1, n_pad - Nnx), jnp.float32)],
                axis=1,
            )
            s = tuple(state_row[0, i] for i in range(12))  # truth
            plant = plant_at(t)          # per-tick row when wind varies
            # the filter's process model: nominal row in observer mode;
            # otherwise the (possibly time-varying) truth row — the staged
            # loop's generous truth-process-model semantics for wind_fn
            ekf_plant = nom_plant if use_dob else plant

            # ---- EKF predict (per-tick analytic-F covariance) ------------
            prev_c = tuple(aux_row[0, 11 + i] for i in range(4))
            ex = tuple(est_row[0, i] for i in range(12))
            # process model = ONE RK4 step at the control dt (ekf_step);
            # the stage states double as the linearisation points of the
            # transition Jacobian F = I + h/6 (K1 + 2K2 + 2K3 + K4) with
            # K_{i+1} = J(x_i)(I + c_i h K_i) — the exact RK4 chain rule
            # (px4_step_jacobian), relinearised EVERY tick from the
            # hand-derived analytic J (no frozen-F approximation)
            k1 = _derivative(ex, prev_c, ekf_plant)
            x2 = _axpy(ex, k1, 0.5 * dt)
            k2 = _derivative(x2, prev_c, ekf_plant)
            x3 = _axpy(ex, k2, 0.5 * dt)
            k3 = _derivative(x3, prev_c, ekf_plant)
            x4 = _axpy(ex, k3, dt)
            k4 = _derivative(x4, prev_c, ekf_plant)
            xp = tuple(
                ex[i]
                + (dt / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i])
                for i in range(12)
            )
            if use_dob:
                # exact double-integrator injection of the disturbance over
                # one step (estimation.disturbance.dekf_step's aug_step)
                dprev = (est_row[0, 12], est_row[0, 13], est_row[0, 14])
                hh = 0.5 * dt * dt
                xp = (
                    xp[0] + hh * dprev[0], xp[1] + hh * dprev[1],
                    xp[2] + hh * dprev[2],
                    xp[3] + dt * dprev[0], xp[4] + dt * dprev[1],
                    xp[5] + dt * dprev[2],
                ) + xp[6:]
            Fd = (_fd_chain(ex, prev_c, x2, x3, x4, ekf_plant)  # F = I + Fd
                  if relin_per_tick else fd_frozen)
            # (I+Fd) P (I+Fd)' + Q with P symmetric: no materialised identity
            FdP = dot_cov(Fd, P)
            P_pred = P + FdP + FdP.T + dot_cov(FdP, Fd.T) + Qmat

            # ---- EKF update: 9 sequential scalar measurement fusions -----
            # (the disturbance lanes 12:15 are corrected through P's
            # cross-covariance — Krow spans the full padded row)
            wrap = lambda a: (a + jnp.pi) % two_pi - jnp.pi
            if use_dob:
                xrow = jnp.stack(
                    xp + dprev + (zero,) * (PK - 15)
                ).reshape(1, PK)
            else:
                xrow = jnp.stack(xp + (zero,) * (PK - 12)).reshape(1, PK)
            Pm = P_pred
            for j in EKF_MEAS_IDX:
                zj = s[j] + noise_ref[t, j]       # truth + presampled noise
                innov = zj - xrow[0, j]
                if j == 8:                        # yaw seam
                    innov = wrap(innov)
                S = Pm[j, j] + rdiag_ref[0, j]
                Krow = Pm[j : j + 1, :] / S       # symmetric P: row == col
                xrow = xrow + innov * Krow
                Pm = Pm - (Pm[:, j : j + 1] / S) * Pm[j : j + 1, :]
            # wrap attitude estimates (staged ekf_step does)
            exn = tuple(
                wrap(xrow[0, i]) if 6 <= i <= 8 else xrow[0, i]
                for i in range(12)
            )
            dn = (
                (xrow[0, 12], xrow[0, 13], xrow[0, 14]) if use_dob else ()
            )
            est_new = jnp.stack(
                exn + dn + (zero,) * (n_pad - 12 - len(dn))
            ).reshape(1, n_pad)

            # ---- GP horizon posterior on the ESTIMATE trajectory --------
            # (mirrors _make_multitick_kernel; aux lanes 0:6 hold the
            # estimate's stage-0 anchor, set below each tick)
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

                Fg = jnp.stack(
                    [jnp.stack(stage_features(k)) for k in range(N)]
                )
                Zf = Fg * invls_ref[0:1, :] - invls_ref[1:2, :]
                sq1 = jnp.sum(Zf * Zf, axis=1, keepdims=True)
                cross = dot(Zf, ztrT_ref[:])
                dists = jnp.maximum(sq1 + sq2_ref[:] - 2.0 * cross, 0.0)
                sf2 = scal_ref[0, 0]
                gain = scal_ref[0, 1]
                Kst = sf2 * jnp.exp(-0.5 * dists)
                mean = dot(Kst, alphas_ref[:]) + ymean_ref[:]
            if use_gp or use_dob:
                # stage residual feedforward in w = control_dt * D units
                # (closed_loop._fused_tick_rollout's conversion): the GP
                # posterior mean and/or the observer's constant-acceleration
                # estimate SUM on the velocity-derivative lanes — the staged
                # path's `residuals + dob_rows` composition
                w_scalars = []
                for k in range(N):
                    w_scalars.extend([zero, zero, zero])
                    for j in range(3):
                        val = gain * mean[k, 3 + j] if use_gp else zero
                        if use_dob:
                            val = val + dt * dn[j]
                        w_scalars.append(val)
                w_scalars.extend([zero] * (n_pad - Nnx))
                w_row = jnp.stack(w_scalars).reshape(1, n_pad)
            else:
                w_row = jnp.zeros((1, n_pad), jnp.float32)

            # ---- MPC on the ESTIMATE (same blocks as the multitick kernel)
            zy = _warm_shift_rolls(
                jnp.concatenate([z_prev, y_prev], axis=0),
                Nnu, Nnx, nu, nx, interpret,
            )
            z0, y0 = zy[0:1], zy[1:2]
            xw = jnp.concatenate([est_new, w_row], axis=1)
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

            ax = jnp.clip(z_fin[0, 0], accel_lo[0], accel_hi[0])
            ay = jnp.clip(z_fin[0, 1], accel_lo[1], accel_hi[1])
            az = jnp.clip(z_fin[0, 2], accel_lo[2], accel_hi[2])
            yr = jnp.clip(z_fin[0, 3], -yawrate_limit, yawrate_limit)
            integral = (aux_row[0, 8], aux_row[0, 9], aux_row[0, 10])

            thrust_hi = jnp.float32(1.2)
            if fallback_error_m > 0.0:
                # divergence guard on the controller-visible state
                ex0 = ref_row[0, 0] - exn[0]
                ey0 = ref_row[0, 1] - exn[1]
                ez0 = ref_row[0, 2] - exn[2]
                diverged = (
                    ex0 * ex0 + ey0 * ey0 + ez0 * ez0 > fallback_error_m**2
                )
                ks = fallback_accel_scale
                fb = lambda e, v, lo, hi: jnp.clip(1.5 * e - 0.8 * v,
                                                   ks * lo, ks * hi)
                ax = jnp.where(diverged, fb(ex0, exn[3], accel_lo[0], accel_hi[0]), ax)
                ay = jnp.where(diverged, fb(ey0, exn[4], accel_lo[1], accel_hi[1]), ay)
                az = jnp.where(diverged, fb(ez0, exn[5], accel_lo[2], accel_hi[2]), az)
                yr = jnp.where(diverged, 0.0, yr)
                thrust_hi = jnp.where(
                    diverged, jnp.float32(fallback_thrust_ceiling), thrust_hi
                )

            # allocation sees the ESTIMATE; the plant integrates the truth
            c, att_sp, new_int = _allocation(
                exn, (ax, ay, az, yr, yaw_ref), integral, dt, gravity,
                thrust_ceiling=thrust_hi,
            )
            s_new = _rk4_substeps(s, c, plant, dt, substeps)

            # packed: state 0:12 | control 12:16 | att_sp 16:19 |
            # integral 19:22 | accel 22:25 | u0 25:29 | vel_ref 29:32 |
            # estimate 32:44 | disturbance_est 44:47 (observer mode)
            packed = jnp.stack(
                s + c + att_sp + new_int + (ax, ay, az)
                + (z_fin[0, 0], z_fin[0, 1], z_fin[0, 2], z_fin[0, 3])
                + (X_tail[0, 3], X_tail[0, 4], X_tail[0, 5])
                + exn + dn
                + (zero,) * (n_pad - 44 - len(dn))
            ).reshape(1, n_pad)
            out_ref[pl.ds(t, 1), :] = packed

            new_state_row = jnp.stack(
                s_new + (zero,) * (n_pad - 12)
            ).reshape(1, n_pad)
            new_aux = jnp.stack(
                exn[0:6] + (zero, zero) + new_int + c
                + (zero,) * (n_pad - 15)
            ).reshape(1, n_pad)
            return (new_state_row, est_new, Pm, new_aux, X_tail, z_fin, y_fin)

        init = (state_ref[:], est_ref[:], p_ref[:], aux_ref[:], xtail_ref[:],
                z0_ref[:], y0_ref[:])
        (state_row, est_row, P, aux_row, xtail_row, z_fin, y_fin) = (
            jax.lax.fori_loop(0, k_ticks, one_tick, init)
        )
        state_out_ref[:] = state_row
        est_out_ref[:] = est_row
        p_out_ref[:] = P
        aux_out_ref[:] = aux_row
        xtail_out_ref[:] = xtail_row
        z_ref[:] = z_fin
        y_ref[:] = y_fin

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_ticks", "use_gp", "iterations", "over_relax", "rho",
        "dt", "substeps", "accel_lo", "accel_hi", "yawrate_limit",
        "interpret", "loop_precision", "n", "nu", "nx",
        "fallback_error_m", "fallback_thrust_ceiling",
        "fallback_accel_scale", "relinearize_per_tick", "cov_precision",
        "use_dob",
    ),
)
def gpmpc_noisy_multitick_fused(
    data: FusedTickData,
    gp: GPRows | None,
    state_row: jnp.ndarray,    # (1, n_pad) TRUE state, lanes 0:12
    est_row: jnp.ndarray,      # (1, n_pad) EKF estimate, lanes 0:12
                               #   (+ disturbance est 12:15 in observer mode)
    p_mat: jnp.ndarray,        # (PK, PK) covariance (12x12 block; 15x15
                               #   in observer mode)
    aux_row: jnp.ndarray,      # (1, n_pad): est x0 0:6, integral 8:11,
                               #   prev applied control 11:15
    xtail_row: jnp.ndarray,
    z0: jnp.ndarray,
    y0: jnp.ndarray,
    refs: jnp.ndarray,         # (k_ticks, n_pad); lane n_pad-1 = yaw_ref
    noise: jnp.ndarray,        # (k_ticks, n_pad): measurement noise per
                               #   STATE lane (measured lanes only)
    plant_row: jnp.ndarray,
    q_mat: jnp.ndarray,        # (PK, PK) diag(process noise)
    rdiag_row: jnp.ndarray,    # (1, PK) measurement noise var per state lane
    k_ticks: int,
    use_gp: bool,
    rho: float,
    iterations: int,
    over_relax: float,
    dt: float,
    substeps: int,
    accel_lo: tuple,
    accel_hi: tuple,
    yawrate_limit: float,
    interpret: bool = False,
    loop_precision: str = "highest",
    n: int = 0,
    nu: int = 4,
    nx: int = 6,
    fallback_error_m: float = 0.0,
    fallback_thrust_ceiling: float = 1.5,
    fallback_accel_scale: float = 1.5,
    relinearize_per_tick: bool = True,
    cov_precision: str = "highest",
    use_dob: bool = False,
    nominal_row: jnp.ndarray | None = None,   # (1, 16) observer process model
    bdist_mat: jnp.ndarray | None = None,     # (PK, PK) d-injection Jacobian
):
    """K whole noisy ticks (EKF + MPC + allocation + plant) per dispatch.

    Returns ``(packed (k_ticks, n_pad), state_row, est_row, p_mat, aux_row,
    xtail_row, z, y)`` — packed lanes as the multitick kernel plus the
    per-tick EKF estimate at 32:44 (and the observer's disturbance estimate
    at 44:47 when ``use_dob``).

    ``use_dob`` runs the 15-state augmented disturbance observer
    (``estimation.disturbance``) in place of the 12-state filter: the EKF
    predicts with ``nominal_row`` (the wind-free controller-side model), the
    innovation the nominal plant cannot explain lands in the random-walk
    acceleration lanes 12:15 of the estimate, and the MPC receives the
    estimate as stage-wise residual feedforward (summed with the in-kernel
    GP rows when both are active). ``q_mat`` must carry the augmented
    process noise (lanes 12:15 = q_dist^2) and ``bdist_mat`` the exact
    d-injection block of the transition Jacobian."""
    ctrl = data.ctrl
    m_pad = ctrl.P1.shape[0]
    n_pad = ctrl.SxT.shape[0]
    if n_pad > 128 and not interpret:
        # the in-kernel scalar-lane packing (jnp.stack of per-lane scalars
        # into (1, n_pad) rows) only lowers within ONE 128-lane tile on
        # Mosaic ("Input offsets outside of the first tile" otherwise);
        # every shipped fused-path configuration uses horizon=20 (N*nx+1 =
        # 121 -> n_pad=128). Fail actionably instead of deep in Mosaic.
        raise ValueError(
            f"fused tick kernels support n_pad<=128 on TPU (got {n_pad}: "
            "horizon too long — use horizon<=21 for the 6-state model, or "
            "the staged path)"
        )
    base = _make_noisy_multitick_kernel(
        k_ticks, n, nu, nx, use_gp,
        iterations, over_relax, rho, dt, substeps,
        accel_lo, accel_hi, yawrate_limit,
        loop_precision=(jax.lax.Precision.DEFAULT
                        if loop_precision == "default"
                        else jax.lax.Precision.HIGHEST),
        fallback_error_m=fallback_error_m,
        fallback_thrust_ceiling=fallback_thrust_ceiling,
        fallback_accel_scale=fallback_accel_scale,
        interpret=interpret,
        relin_per_tick=relinearize_per_tick,
        cov_precision=(jax.lax.Precision.DEFAULT
                       if cov_precision == "bf16"
                       else jax.lax.Precision.HIGHEST),
        use_dob=use_dob,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    if gp is None:  # placeholder rows keep the arg list static
        gp = GPRows(
            ztrT=jnp.zeros((16, 8), jnp.float32),
            sq2_row=jnp.zeros((1, 8), jnp.float32),
            alpha_s=jnp.zeros((8, 8), jnp.float32),
            y_mean_row=jnp.zeros((1, 8), jnp.float32),
            inv_ls_row=jnp.zeros((2, 16), jnp.float32),
            scal_row=jnp.zeros((1, 8), jnp.float32),
        )
    if nominal_row is None:
        nominal_row = plant_row      # unread unless use_dob
    if bdist_mat is None:
        bdist_mat = jnp.zeros((8, 128), jnp.float32)  # placeholder
    operands = (
        state_row, est_row, p_mat, aux_row, xtail_row, z0, y0,
        refs, noise, plant_row, q_mat, rdiag_row,
        nominal_row, bdist_mat,
        gp.ztrT, gp.sq2_row, gp.alpha_s, gp.y_mean_row, gp.inv_ls_row,
        gp.scal_row,
        data.SxSwT, ctrl.SuTqT, ctrl.SuT,
        ctrl.P1, data.PM, ctrl.P0matT,
        ctrl.u_lo_row, ctrl.u_hi_row, ctrl.x_lo_row, ctrl.x_hi_row,
    )
    return pl.pallas_call(
        base,
        out_shape=(
            jax.ShapeDtypeStruct((k_ticks, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((PK, PK), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
        ),
        in_specs=[vmem] * len(operands),
        out_specs=(vmem,) * 8,
        interpret=interpret,
    )(*operands)
