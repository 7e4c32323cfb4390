"""Pallas TPU kernel: the whole fixed-iteration ADMM solve in one kernel.

Latency-mode motivation: the linear MPC's ADMM loop is ~60 iterations of
three skinny matmuls on (256, 128)-class operands. As XLA ops inside a
``fori_loop`` each iteration pays kernel-dispatch overhead that dwarfs its
FLOPs (profiled ~0.55 us/iteration on v5e). Here the *entire* solve — all
iterations, all three matmuls, the projection and dual update — runs inside
ONE Pallas kernel with every operand VMEM-resident: one dispatch, zero HBM
traffic between iterations.

Operand layout (padded to MXU-friendly shapes at controller build time):
  M_inv (n, n), G (m, n), GT (n, m)   — static problem data
  f, U as (1, n) row vectors; z, y, bounds as (1, m)
Padding is semantically inert: padded M_inv rows/cols are zero (U stays 0),
padded constraint rows have G = 0 and lo = hi = 0 (z, y stay 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(iterations: int, over_relax: float):
    prec = jax.lax.Precision.HIGHEST

    def kernel(minv_ref, g_ref, gt_ref, f_ref, lo_ref, hi_ref,
               z0_ref, y0_ref, rho_ref, u_ref, z_ref, y_ref):
        minv = minv_ref[:]
        g = g_ref[:]
        gt = gt_ref[:]
        f = f_ref[:]
        lo = lo_ref[:]
        hi = hi_ref[:]
        rho = rho_ref[0, 0]

        def body(_, carry):
            z, y = carry
            rhs = -f + jax.lax.dot_general(
                rho * z - y, g,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )                                     # (1, n)
            u = jax.lax.dot_general(
                rhs, minv,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )                                     # (1, n)  (M_inv symmetric)
            gu = jax.lax.dot_general(
                u, gt,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )                                     # (1, m)
            gt_relaxed = over_relax * gu + (1.0 - over_relax) * z
            z_new = jnp.clip(gt_relaxed + y / rho, lo, hi)
            y_new = y + rho * (gt_relaxed - z_new)
            return (z_new, y_new)

        z_fin, y_fin = jax.lax.fori_loop(0, iterations, body, (z0_ref[:], y0_ref[:]))
        # one more primal update so u is consistent with the final (z, y)
        rhs = -f + jax.lax.dot_general(
            rho * z_fin - y_fin, g,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        u_ref[:] = jax.lax.dot_general(
            rhs, minv,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        z_ref[:] = z_fin
        y_ref[:] = y_fin

    return kernel


@functools.partial(
    jax.jit, static_argnames=("iterations", "over_relax", "interpret")
)
def admm_box_qp_fused(
    M_inv: jnp.ndarray,   # (n, n) padded
    G: jnp.ndarray,       # (m, n) padded
    GT: jnp.ndarray,      # (n, m) padded
    f: jnp.ndarray,       # (1, n)
    lower: jnp.ndarray,   # (1, m)
    upper: jnp.ndarray,   # (1, m)
    z0: jnp.ndarray,      # (1, m)
    y0: jnp.ndarray,      # (1, m)
    rho: float,
    iterations: int,
    over_relax: float = 1.6,
    interpret: bool = False,
):
    """Returns ``(U (1,n), z (1,m), y (1,m))`` after ``iterations`` fixed
    over-relaxed ADMM steps, all inside one Pallas kernel."""
    n = M_inv.shape[0]
    m = G.shape[0]
    rho_arr = jnp.asarray(rho, jnp.float32).reshape(1, 1)
    kernel = _make_kernel(iterations, over_relax)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(M_inv, G, GT, f, lower, upper, z0, y0, rho_arr)


def _make_composite_kernel(iterations: int, over_relax: float):
    prec = jax.lax.Precision.HIGHEST

    def kernel(p1_ref, p0_ref, gminvt_ref, minvf_ref, lo_ref, hi_ref,
               z0_ref, y0_ref, rho_ref, u_ref, z_ref, y_ref):
        P1 = p1_ref[:]
        p0 = p0_ref[:]
        lo = lo_ref[:]
        hi = hi_ref[:]
        rho = rho_ref[0, 0]

        def body(_, carry):
            z, y = carry
            GU = p0 + jax.lax.dot_general(
                rho * z - y, P1,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )                                   # (1, m); P1 symmetric
            Gt = over_relax * GU + (1.0 - over_relax) * z
            z_new = jnp.clip(Gt + y / rho, lo, hi)
            y_new = y + rho * (Gt - z_new)
            return (z_new, y_new)

        z_fin, y_fin = jax.lax.fori_loop(0, iterations, body, (z0_ref[:], y0_ref[:]))
        u_ref[:] = -minvf_ref[:] + jax.lax.dot_general(
            rho * z_fin - y_fin, gminvt_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        z_ref[:] = z_fin
        y_ref[:] = y_fin

    return kernel


@functools.partial(
    jax.jit, static_argnames=("iterations", "over_relax", "interpret")
)
def admm_box_qp_fused_composite(
    P1: jnp.ndarray,       # (m, m) padded, = G M^{-1} G'
    p0: jnp.ndarray,       # (1, m)       = -G M^{-1} f
    GMinvT: jnp.ndarray,   # (n, m) padded, = M^{-1} G'
    Minv_f: jnp.ndarray,   # (1, n)
    lower: jnp.ndarray,    # (1, m)
    upper: jnp.ndarray,    # (1, m)
    z0: jnp.ndarray,
    y0: jnp.ndarray,
    rho: float,
    iterations: int,
    over_relax: float = 1.6,
    interpret: bool = False,
):
    """Operator-composed fused ADMM: ONE (m, m) matvec per iteration inside
    one Pallas kernel — the shortest possible dependency chain for the
    latency-bound solve (see ``ops.qp.admm_box_qp_composite``)."""
    n = GMinvT.shape[0]
    m = P1.shape[0]
    rho_arr = jnp.asarray(rho, jnp.float32).reshape(1, 1)
    kernel = _make_composite_kernel(iterations, over_relax)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(P1, p0, GMinvT, Minv_f, lower, upper, z0, y0, rho_arr)


def pad_to(x: jnp.ndarray, rows: int, cols: int | None = None) -> jnp.ndarray:
    """Zero-pad a matrix/vector up to MXU-friendly dimensions."""
    import numpy as np

    x = np.asarray(x)
    if x.ndim == 1:
        out = np.zeros(rows, x.dtype)
        out[: x.shape[0]] = x
        return out
    out = np.zeros((rows, cols), x.dtype)
    out[: x.shape[0], : x.shape[1]] = x
    return out
