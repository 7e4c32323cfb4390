"""Pallas TPU kernel: fused RBF kernel-matrix construction.

The GP hot kernel (SURVEY.md section 7 stage 3): the squared-distance GEMM
trick + exp, all in VMEM. XLA computes ``Z1 @ Z2.T`` on the MXU, then writes
the (n1, n2) distance matrix to HBM, reads it back for the elementwise tail;
for big training sets (the 10k-sample offline fits,
``src/px4/train_gp_offline.py:155-163``) that is two avoidable HBM round
trips over an O(n^2) array. This kernel tiles (n1, n2) into VMEM blocks and
fuses norms + matmul + exp per block: the distance matrix never exists in
HBM.

Feature dims here are tiny (10-16), so each block is one skinny
``(TILE, d) @ (d, TILE)`` MXU call plus VPU elementwise. Inputs are
pre-scaled by the length-scale(s) host-side (ARD comes for free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _rbf_block_kernel(z1_ref, z2_ref, sig_ref, out_ref):
    z1 = z1_ref[:]                       # (TILE, d)
    z2 = z2_ref[:]                       # (TILE, d)
    cross = jax.lax.dot_general(
        z1, z2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # bf16 passes break PSD-ness
    )                                    # (TILE, TILE)
    sq1 = jnp.sum(z1 * z1, axis=1, keepdims=True)
    sq2 = jnp.sum(z2 * z2, axis=1, keepdims=True)
    dists = jnp.maximum(sq1 + sq2.T - 2.0 * cross, 0.0)
    out_ref[:] = sig_ref[0, 0] * jnp.exp(-0.5 * dists)


def _pad_rows(x, multiple):
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    return x, n


# ---------------------------------------------------------------------------
# Fused posterior mean: dist -> exp -> alpha GEMM, K_star never leaves VMEM
# ---------------------------------------------------------------------------

MEAN_TILE = 512

# bf16-limb compensation terms per precision tier: each entry is a
# (left_limb, right_limb) index pair; limb 0 = bf16(x), limb 1 = bf16 of the
# f32 remainder, limb 2 = bf16 of the second remainder. Summing the listed
# products reconstructs the f32 product to ~2^-9 / 2^-17 / 2^-25 relative.
_LIMB_TERMS = {
    "default": ((0, 0),),
    "high": ((0, 0), (0, 1), (1, 0)),
    "highest": ((0, 0), (0, 1), (1, 0), (0, 2), (2, 0), (1, 1)),
}
_NUM_LIMBS = {"default": 1, "high": 2, "highest": 3}


def _split_limbs(x: jnp.ndarray, n: int) -> list[jnp.ndarray]:
    """Split f32 into n bf16 limbs, hi -> lo (each remainder is exact f32).

    The ``optimization_barrier`` is load-bearing: under jit, XLA:TPU elides
    f32 -> bf16 -> f32 convert round-trips inside fusions, which would turn
    every remainder into ``x - x = 0`` and silently collapse the
    compensated-limb scheme to plain bf16 (observed: dist error jumped
    1e-4 -> 0.6 on real flight features, identically across limb tiers).
    The barrier pins the bf16 rounding as a real operation."""
    limbs = []
    rem = x.astype(jnp.float32)
    for _ in range(n):
        hi = jax.lax.optimization_barrier(rem.astype(jnp.bfloat16))
        limbs.append(hi)
        rem = rem - hi.astype(jnp.float32)
    return limbs


def _split_limbs_masked(x: jnp.ndarray, n: int) -> list[jnp.ndarray]:
    """In-kernel limb split via mantissa masking (Mosaic-safe).

    ``optimization_barrier`` has no Pallas TPU lowering, so inside kernels
    the limbs are carved by zeroing the low 16 mantissa bits — a
    round-toward-zero bf16 whose remainder ``x - hi`` is exact in f32.
    Returned limbs stay f32 but are bf16-representable bit-for-bit, so the
    MXU's DEFAULT-precision operand rounding is a no-op on them."""
    limbs = []
    rem = x.astype(jnp.float32)
    for i in range(n):
        if i == n - 1:
            limbs.append(rem)   # last limb keeps the residue (rounds in MXU)
            break
        bits = jax.lax.bitcast_convert_type(rem, jnp.uint32)
        hi = jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32
        )
        limbs.append(hi)
        rem = rem - hi
    return limbs


def _mean_block_kernel_t(precision, P_pad, out_pad):
    terms = _LIMB_TERMS[precision]
    n_limbs = _NUM_LIMBS[precision]

    def kernel(ztest_ref, ztrain_ref, a_ref, out_ref):
        # ztest_ref:  (C, MEAN_TILE) bf16 — packed test columns, lanes =
        #             test points; ztrain_ref: (P_pad, C) bf16 — matching
        #             train columns. ONE single-pass MXU dot evaluates the
        #             ENTIRE squared distance (limb-compensated): per input
        #             dim the columns run [te^2 limbs x 1 | tr limb x
        #             (-2 te) limb | tr^2 limbs x 1], so the systolic
        #             accumulator CANCELS per dimension — the running sum
        #             peaks at one dim's te^2 (~O(z_d^2)) instead of the
        #             full ||z1||^2 + ||z2||^2, and the classic f32
        #             catastrophic cancellation of sq1 + sq2 - 2 cross never
        #             happens outside the accumulator. C <= 120 fits one
        #             128-deep K tile, so f32-grade accuracy costs the same
        #             as plain bf16 — the limbs ride in dead K lanes.
        dists = jnp.maximum(
            jax.lax.dot_general(
                ztrain_ref[:], ztest_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ),
            0.0,
        )                                           # (P_pad, MEAN_TILE)
        k_star = jnp.exp(-0.5 * dists)              # sigma^2 folded into alpha

        if precision == "highest":
            # Native 6-pass HIGHEST dot on the f32 operands: the MXU's own
            # limb decomposition is the SAME 6-term product set as the
            # manual scheme, but the k_star mantissa splits (2 extra
            # VPU mask/sub rounds over the whole (P_pad, TILE) block) never
            # happen. Slope-measured at the throughput shape (v5e,
            # 20480 x 896): 125.9 -> 91.4 us/step at 3.5e-7 agreement.
            # "high" keeps the manual path: its 3-term scheme costs 3 MXU
            # passes + ONE split round, which measures BELOW the native
            # 6-pass dot (71.4 vs 80.2 us/step) — Mosaic lowers only
            # DEFAULT and HIGHEST, so there is no native 3-pass option.
            out_ref[:] = jax.lax.dot_general(
                a_ref[:], k_star,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return

        k_limbs = _split_limbs_masked(k_star, n_limbs)
        acc = jnp.zeros((out_pad, MEAN_TILE), jnp.float32)
        for (la, lk) in terms:
            a_limb = a_ref[la * out_pad:(la + 1) * out_pad, :]  # (out_pad, P_pad)
            acc = acc + jax.lax.dot_general(
                a_limb, k_limbs[lk],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
        out_ref[:] = acc

    return kernel


ROW_TILE = 2048


def _mean_block_kernel_rows(precision, P_pad, out_pad, tile=ROW_TILE):
    """Row-layout tier ("default" only): the distance dot carries ONLY the
    cross products (C = d / 3d lanes instead of 3d / 6d), with the exact-f32
    test/train norms added OUTSIDE the accumulator. Round-5 restructuring:
    the padded K-depth of the packed dot was the measured bound of the fused
    GP stage (the MXU at K=32/64 is 12-25% utilised over 18M outputs; the
    VMEM-resident exp streams at ~1.4 Texp/s, i.e. exp is NOT the bound) —
    halving C halves the stage. Accuracy is unchanged-or-better: the norm
    terms were previously bf16-limb products of the same tier, now exact
    f32 adds; the cross keeps the identical limb-term set."""
    terms = _LIMB_TERMS[precision]
    n_limbs = _NUM_LIMBS[precision]

    def kernel(ztest_ref, sq1_ref, ztrain_ref, sq2_ref, a_ref, out_ref):
        # ztest_ref: (tile, C) bf16 rows (natural layout — no HBM
        # transpose); ztrain_ref: (P_pad, C) bf16; sq1_ref: (1, tile)
        # f32; sq2_ref: (P_pad, 8) f32 (column 0 live)
        cross2 = jax.lax.dot_general(
            ztrain_ref[:], ztest_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )                                           # == -2 z_tr . z_te
        dists = jnp.maximum(
            sq2_ref[:, 0:1] + sq1_ref[:] + cross2, 0.0
        )                                           # (P_pad, tile)
        k_star = jnp.exp(-0.5 * dists)

        k_limbs = _split_limbs_masked(k_star, n_limbs)
        acc = jnp.zeros((out_pad, tile), jnp.float32)
        for (la, lk) in terms:
            a_limb = a_ref[la * out_pad:(la + 1) * out_pad, :]
            acc = acc + jax.lax.dot_general(
                a_limb, k_limbs[lk],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
        out_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def rbf_posterior_mean_pallas(
    posterior,
    X_test: jnp.ndarray,
    interpret: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """Fused GP posterior mean: ``K_*(X_test, X_train) @ alpha * y_std + y_mean``.

    Numerically mirrors ``gp.exact_gp.predict_mean`` (including ``x_shift``
    centering and sklearn's ``normalize_y`` unscaling), but the
    ``(m, n_train)`` cross-kernel matrix is tiled through VMEM and never
    materialised in HBM. At the throughput tier's shapes (B=1024 flights
    x N=20 stages x 800 training points) the XLA path writes + re-reads a
    66 MB K_star every tick — ~180 us of pure HBM traffic on v5e, 62% of
    the whole tick; this kernel's HBM traffic is the ~2 MB feature matrix
    and the ~1 MB output (the exp itself streams at >500 Gexp/s on the VPU,
    measured: triple-exp costs the same as a row-sum).

    Layout: TRANSPOSED relative to the XLA path — test points ride the lane
    dimension, train points the sublane dimension — so the alpha contraction
    is an ``(out_pad, P) @ (P, TILE)`` dot whose tiny M makes it near-free,
    instead of a 6-pass ``(TILE, P) @ (P, 8)``.

    Precision: the MXU multiplies in bf16; instead of multi-pass HIGHEST
    (6x cost), operands are split into bf16 limbs and ALL of
    ``||z1||^2 + ||z2||^2 - 2 z1.z2`` is packed into the dead K lanes of
    one skinny distance dot (per-dim column order te^2 / cross / tr^2, so
    the MXU accumulator cancels per dimension — the classic f32
    catastrophic cancellation never happens outside the accumulator, which
    on real flight features with ||alpha||_1 ~ 1e3 is worth ~100x accuracy
    over a separate sq1 + sq2 - 2 cross). Reduction depth 30/70/120 all fit
    one 128-deep MXU K tile, so "high" (~2^-17 products) and "highest"
    (~2^-25, f32-grade) cost the same single pass as plain bf16. The alpha
    contraction applies the same limb scheme as separate near-free dots.

    ``X_test (m, d)`` -> ``(m, out)``.
    """
    p = posterior.params
    dtype = jnp.float32
    ls = jnp.broadcast_to(
        jnp.asarray(p.length_scale, dtype), (X_test.shape[1],)
    )
    X = X_test.astype(dtype)
    if posterior.x_shift is not None:
        X = X - posterior.x_shift.astype(dtype)
    Z = X / ls
    Zt = posterior.X_train.astype(dtype) / ls

    out_dim = posterior.alpha.shape[1]
    out_pad = max(8, ((out_dim + 7) // 8) * 8)
    pad_lane = lambda v: ((v + 127) // 128) * 128
    d = Z.shape[1]
    P = Zt.shape[0]
    P_pad = pad_lane(P)
    if P_pad > 4096:
        # the kernel holds ALL train points VMEM-resident per block
        # (k_star block = P_pad x MEAN_TILE f32); corpus-scale posteriors
        # (e.g. the 19.8k sharded fit) would blow VMEM — use the staged path
        from ..gp.exact_gp import predict_mean

        return predict_mean(posterior, X_test).astype(dtype)
    n_limbs = _NUM_LIMBS[precision]
    terms = _LIMB_TERMS[precision]

    m = Z.shape[0]
    m_pad = ((m + MEAN_TILE - 1) // MEAN_TILE) * MEAN_TILE

    sig = jnp.asarray(p.signal_variance, dtype)
    a_scaled = jnp.zeros((P, out_pad), dtype).at[:, :out_dim].set(
        sig * posterior.alpha.astype(dtype) * posterior.y_std.astype(dtype)
    )
    if precision == "highest":
        # the kernel contracts alpha with one native HIGHEST dot — f32
        # operand, no limb stack (see _mean_block_kernel_t)
        a_stack = jnp.zeros((out_pad, P_pad), dtype).at[:, :P].set(a_scaled.T)
        a_rows = out_pad
    else:
        a_limbs = _split_limbs(a_scaled.T, n_limbs)     # each (out_pad, P)
        a_stack = jnp.zeros((n_limbs * out_pad, P_pad), jnp.bfloat16)
        for i, al in enumerate(a_limbs):
            a_stack = a_stack.at[i * out_pad:(i + 1) * out_pad, :P].set(al)
        a_rows = n_limbs * out_pad

    if precision == "default":
        # row-layout tier: cross-products-only dot (C = d lanes) + exact
        # f32 norms outside the accumulator — see _mean_block_kernel_rows.
        # Kills the packed dot's extra K-depth and the (d*S, m) HBM
        # transpose of the packing; norms move from bf16 limb products to
        # exact f32 adds (accuracy unchanged-or-better at this tier).
        # "high"/"highest" stay on the packed per-dim-cancellation path:
        # measured on real flight features, row-layout "high" trades 6x
        # accuracy (dist err 2^-16*||z||^2 vs 2^-16*per-dim max) for <10%
        # speed — not worth it where the ~2^-17 claim is the tier's point.
        # ROW_TILE=2048: the measured per-block fixed cost was ~25% of the
        # stage at 512.
        # VMEM budget: k_star + its limb copies are (P_pad, tile) f32 each
        vmem_cap = 26 * 1024 * 1024
        tmax = vmem_cap // (P_pad * 4 * (n_limbs + 1))
        tile = max(512, min(ROW_TILE, (tmax // 512) * 512))
        tile = min(tile, ((m + 511) // 512) * 512)  # don't over-pad small m
        m_pad_r = ((m + tile - 1) // tile) * tile
        u_limbs = _split_limbs(-2.0 * Z, n_limbs)       # bf16 limbs, test
        tr_limbs = _split_limbs(Zt, n_limbs)            # bf16 limbs, train
        test_cols = jnp.concatenate(
            [u_limbs[lt] for (_, lt) in terms], axis=1
        )                                               # (m, d*T)
        train_cols = jnp.concatenate(
            [tr_limbs[ltr] for (ltr, _) in terms], axis=1
        )                                               # (P, d*T)
        C = ((test_cols.shape[1] + 7) // 8) * 8
        ztest = jnp.zeros((m_pad_r, C), jnp.bfloat16).at[
            :m, : test_cols.shape[1]].set(test_cols)
        ztrain = jnp.zeros((P_pad, C), jnp.bfloat16).at[
            :P, : train_cols.shape[1]].set(train_cols)
        sq1 = jnp.zeros((1, m_pad_r), dtype).at[0, :m].set(
            jnp.sum(Z * Z, axis=1)
        )
        sq2 = jnp.zeros((P_pad, 8), dtype).at[:P, 0].set(
            jnp.sum(Zt * Zt, axis=1)
        )
        grid = (m_pad_r // tile,)
        out = pl.pallas_call(
            _mean_block_kernel_rows(precision, P_pad, out_pad, tile),
            out_shape=jax.ShapeDtypeStruct((out_pad, m_pad_r), dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P_pad, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P_pad, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((a_rows, P_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((out_pad, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(ztest, sq1, ztrain, sq2, a_stack)
        return out[:out_dim, :m].T + posterior.y_mean.astype(dtype)[None, :]

    # -- pack the WHOLE squared distance into one dot ---------------------
    # per input dim, in accumulation (= K lane) order:
    #   te^2 limbs     (train col = 1,            test col = limb(te_d^2))
    #   cross products (train col = limb(tr_d),   test col = limb(-2 te_d))
    #   tr^2 limbs     (train col = limb(tr_d^2), test col = 1)
    # the te^2 -> cross -> tr^2 order keeps the running sum bounded by one
    # dim's te^2 before its cancellation completes
    te_sq = _split_limbs(Z * Z, n_limbs)            # each (m, d)
    te_cr = _split_limbs(-2.0 * Z, n_limbs)
    tr_sq = _split_limbs(Zt * Zt, n_limbs)
    tr_cr = _split_limbs(Zt, n_limbs)
    ones_m = jnp.ones((m, d), jnp.bfloat16)
    ones_p = jnp.ones((P, d), jnp.bfloat16)

    test_slots = (
        list(te_sq)
        + [te_cr[l_test] for (_, l_test) in terms]
        + [ones_m] * n_limbs
    )
    train_slots = (
        [ones_p] * n_limbs
        + [tr_cr[l_train] for (l_train, _) in terms]
        + list(tr_sq)
    )
    S = len(test_slots)                             # slots per dim
    # (S, m, d) -> (d, S, m) -> (d*S, m): dim-major, slot-minor lane order
    ztest_cols = jnp.stack(
        [s.astype(jnp.bfloat16) for s in test_slots], axis=0
    ).transpose(2, 0, 1).reshape(d * S, m)
    ztrain_cols = jnp.stack(
        [s.astype(jnp.bfloat16) for s in train_slots], axis=0
    ).transpose(2, 0, 1).reshape(d * S, P)

    C = ((d * S + 7) // 8) * 8
    ztest = jnp.zeros((C, m_pad), jnp.bfloat16).at[: d * S, :m].set(ztest_cols)
    # padded train rows are all-zero -> dist 0 -> k = 1, but their alpha is
    # zero so they contribute exactly nothing to the mean
    ztrain = jnp.zeros((P_pad, C), jnp.bfloat16).at[:P, : d * S].set(
        ztrain_cols.T
    )

    grid = (m_pad // MEAN_TILE,)
    out = pl.pallas_call(
        _mean_block_kernel_t(precision, P_pad, out_pad),
        out_shape=jax.ShapeDtypeStruct((out_pad, m_pad), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((C, MEAN_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_pad, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_rows, P_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_pad, MEAN_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ztest, ztrain, a_stack)
    mean = out[:out_dim, :m].T + posterior.y_mean.astype(dtype)[None, :]
    return mean


@functools.partial(jax.jit, static_argnames=("interpret",))
def rbf_kernel_matrix_pallas(
    X1: jnp.ndarray,
    X2: jnp.ndarray,
    length_scale: jnp.ndarray,
    signal_variance: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """``sigma^2 exp(-0.5 ||(x1-x2)/l||^2)`` as a blocked Pallas kernel.

    ``X1 (n1, d)``, ``X2 (n2, d)``; scalar or per-dimension ``length_scale``.
    Computes in f32 (padded to TILE x TILE blocks); returns ``(n1, n2)``.
    """
    dtype = jnp.float32
    ls = jnp.asarray(length_scale, dtype)
    Z1 = X1.astype(dtype) / ls
    Z2 = X2.astype(dtype) / ls
    Z1p, n1 = _pad_rows(Z1, TILE)
    Z2p, n2 = _pad_rows(Z2, TILE)
    d = Z1p.shape[1]
    sig = jnp.asarray(signal_variance, dtype).reshape(1, 1)

    grid = (Z1p.shape[0] // TILE, Z2p.shape[0] // TILE)
    out = pl.pallas_call(
        _rbf_block_kernel,
        out_shape=jax.ShapeDtypeStruct((Z1p.shape[0], Z2p.shape[0]), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(Z1p, Z2p, sig)
    return out[:n1, :n2]
