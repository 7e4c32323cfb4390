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
