"""Pallas TPU kernel: the entire condensed-QP MPC controller in one dispatch.

Everything between "current state + GP disturbance + reference" and
"optimal control sequence" happens inside a single kernel:

    offset = Sx x0 + Sw w                (prediction offset)
    f      = Su'Q (offset - ref)         (condensed gradient)
    bounds = [u_box; x_box - offset]     (constraint-space box)
    p0, M^-1 f                           (composite-ADMM per-tick vectors)
    ADMM loop: one (m, m) matvec per iteration (operator-composed)
    U      = M^-1(-f + G'(rho z - y))    (final primal)
    X_tail = offset + Su U               (predicted trajectory)

All static matrices are padded host-side at controller build time; vector
rows use the layouts:
    n-row (1, n_pad):  [U-space (N*nu) | zeros]
    m-row (1, m_pad):  [U-block (N*nu) | X-block (N*nx) | zeros]
Padded blocks stay exactly zero through every operation (padded matrix
rows/cols are zero; padded bounds are lo = hi = 0).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FusedControllerData(NamedTuple):
    """Padded static operands (host NumPy; baked as XLA constants)."""

    SxT: np.ndarray       # (n_pad? no: state row) (128, 128): offset = x0 @ SxT
    SwT: np.ndarray       # (128, 128): offset += w @ SwT
    SuTqT: np.ndarray     # (128, 128): f = (offset - ref) @ SuTqT
    SuT: np.ndarray       # (128, 128): X_tail = offset + U @ SuT
    Emb: np.ndarray       # (128, m_pad): places the X-offset into z-layout
    P1: np.ndarray        # (m_pad, m_pad) = G M^-1 G'
    P0mat: np.ndarray     # (128, m_pad) = (G M^-1)'  -> p0 = -(f @ P0mat)
    P0matT: np.ndarray    # (m_pad, 128) = G M^-1     -> U recovery
    MinvT: np.ndarray     # (128, 128) = M^-1 (symmetric)
    u_lo_row: np.ndarray  # (1, m_pad) u bounds in the U-block, zeros elsewhere
    u_hi_row: np.ndarray
    x_lo_row: np.ndarray  # (1, m_pad) x bounds in the X-block, zeros elsewhere
    x_hi_row: np.ndarray


def build_fused_controller_data(
    Sx, Su, Sw, SuT_q, M_inv, G,
    u_lo, u_hi, x_lo, x_hi,
) -> FusedControllerData:
    """Pad the condensed-QP data into the fused-kernel layouts.

    ``Sx (Nnx, nx)``, ``Su (Nnx, Nnu)``, ``Sw (Nnx, Nnx)``,
    ``SuT_q (Nnu, Nnx)``, ``M_inv (Nnu, Nnu)``, ``G (m, Nnu)`` in f64/f32.
    The "state row" layout packs x0 / w / ref / f / U into (1, n_pad) rows,
    n_pad = the 128-multiple covering max(N*nx, N*nu).
    """
    Nnx, nx = Sx.shape
    Nnu = Su.shape[1]
    m = G.shape[0]
    pad128 = lambda v: ((v + 127) // 128) * 128
    nx_pad = pad128(max(Nnx, Nnu, nx))
    m_pad = pad128(m)

    f32 = lambda a: np.asarray(a, np.float32)

    def pad2(a, rows, cols):
        out = np.zeros((rows, cols), np.float32)
        out[: a.shape[0], : a.shape[1]] = a
        return out

    GMinv = G @ M_inv

    SxT = pad2(f32(Sx).T, nx_pad, nx_pad)           # x0-row (x0 in 0:nx)
    SwT = pad2(f32(Sw).T, nx_pad, nx_pad)
    SuTqT = pad2(f32(SuT_q).T, nx_pad, nx_pad)
    SuT = pad2(f32(Su).T, nx_pad, nx_pad)

    Emb = np.zeros((nx_pad, m_pad), np.float32)      # offset -> z layout
    Emb[:Nnx, Nnu : Nnu + Nnx] = np.eye(Nnx, dtype=np.float32)

    P1 = pad2(f32(GMinv @ G.T), m_pad, m_pad)
    P0mat = pad2(f32(GMinv).T, nx_pad, m_pad)
    P0matT = pad2(f32(GMinv), m_pad, nx_pad)
    MinvT = pad2(f32(M_inv), nx_pad, nx_pad)

    row = lambda v, off: np.concatenate(
        [np.zeros(off, np.float32), f32(v),
         np.zeros(m_pad - off - len(v), np.float32)]
    )[None, :]

    return FusedControllerData(
        SxT=SxT, SwT=SwT, SuTqT=SuTqT, SuT=SuT, Emb=Emb,
        P1=P1, P0mat=P0mat, P0matT=P0matT, MinvT=MinvT,
        u_lo_row=row(u_lo, 0), u_hi_row=row(u_hi, 0),
        x_lo_row=row(x_lo, Nnu), x_hi_row=row(x_hi, Nnu),
    )


def _make_kernel(iterations: int, over_relax: float, rho: float):
    prec = jax.lax.Precision.HIGHEST

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    def kernel(x0_ref, w_ref, ref_ref, z0_ref, y0_ref,
               sxt_ref, swt_ref, sutqt_ref, sut_ref, emb_ref,
               p1_ref, p0mat_ref, p0matt_ref, minvt_ref,
               ulo_ref, uhi_ref, xlo_ref, xhi_ref,
               z_ref, y_ref, u_ref, xtail_ref):
        offset = dot(x0_ref[:], sxt_ref[:]) + dot(w_ref[:], swt_ref[:])
        f = dot(offset - ref_ref[:], sutqt_ref[:])           # (1, n)
        off_z = dot(offset, emb_ref[:])                      # (1, m)
        lower = ulo_ref[:] + xlo_ref[:] - off_z
        upper = uhi_ref[:] + xhi_ref[:] - off_z

        p0 = -dot(f, p0mat_ref[:])                           # (1, m)
        minv_f = dot(f, minvt_ref[:])                        # (1, n)
        P1 = p1_ref[:]

        def body(_, carry):
            z, y = carry
            GU = p0 + dot(rho * z - y, P1)
            Gt = over_relax * GU + (1.0 - over_relax) * z
            z_new = jnp.clip(Gt + y / rho, lower, upper)
            y_new = y + rho * (Gt - z_new)
            return (z_new, y_new)

        z_fin, y_fin = jax.lax.fori_loop(
            0, iterations, body, (z0_ref[:], y0_ref[:])
        )
        U = -minv_f + dot(rho * z_fin - y_fin, p0matt_ref[:])  # (1, n)
        z_ref[:] = z_fin
        y_ref[:] = y_fin
        u_ref[:] = U
        xtail_ref[:] = offset + dot(U, sut_ref[:])

    return kernel


@functools.partial(
    jax.jit, static_argnames=("iterations", "over_relax", "rho", "interpret")
)
def gpmpc_controller_fused(
    data: FusedControllerData,
    x0_row: jnp.ndarray,    # (1, 128) state in lanes 0:nx
    w_row: jnp.ndarray,     # (1, 128) stacked disturbance (dt * D) in 0:N*nx
    ref_row: jnp.ndarray,   # (1, 128) stacked state reference in 0:N*nx
    z0: jnp.ndarray,        # (1, m_pad)
    y0: jnp.ndarray,        # (1, m_pad)
    rho: float,
    iterations: int,
    over_relax: float = 1.6,
    interpret: bool = False,
):
    """One fused controller tick. Returns ``(z, y, U, X_tail)`` rows."""
    m_pad = data.P1.shape[0]
    n_pad = data.SxT.shape[0]
    kernel = _make_kernel(iterations, over_relax, rho)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ),
        in_specs=[vmem] * 18,
        out_specs=(vmem, vmem, vmem, vmem),
        interpret=interpret,
    )(
        x0_row, w_row, ref_row, z0, y0,
        data.SxT, data.SwT, data.SuTqT, data.SuT, data.Emb,
        data.P1, data.P0mat, data.P0matT, data.MinvT,
        data.u_lo_row, data.u_hi_row, data.x_lo_row, data.x_hi_row,
    )
