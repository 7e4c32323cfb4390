"""Finite-horizon LQR via backward Riccati recursion (scan-native).

The second solver family named in the north star ("condensed-QP/ADMM-or-
Riccati", BASELINE.json): for the *unconstrained* tracking problem the exact
optimum comes from one backward ``lax.scan`` of Riccati recursions plus one
forward rollout — O(N) in the horizon versus the condensed QP's O(N^2)
matrices, so it is the right engine for long horizons, and its solution
doubles as a high-quality ADMM warm start when constraints are present.

Solves, for affine time-varying dynamics ``x_{k+1} = A_k x_k + B_k u_k + c_k``:

    min sum_k |x_k - xref_k|^2_{Q_k} + |u_k - uref_k|^2_R   (+ terminal Q_N)

with the affine value-function recursion V_k(x) = x'P_k x + 2 q_k'x + const:

    K_k = (R + B'P_{k+1}B)^{-1} B'P_{k+1}A
    d_k = (R + B'P_{k+1}B)^{-1} (B'(P_{k+1}c_k + q_{k+1}) - R uref_k)
    P_k = Q_k + A'P_{k+1}(A - B K_k)
    q_k = A'(P_{k+1}(c_k - B d_k) + q_{k+1}) - Q_k xref_k

All matrices ride a single scan; everything is batchable with ``vmap`` over
problem instances (the "batched Riccati" of the north star).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LQRSolution(NamedTuple):
    U: jnp.ndarray        # (N, nu) optimal controls
    X: jnp.ndarray        # (N+1, nx) optimal trajectory
    gains: jnp.ndarray    # (N, nu, nx) feedback gains K_k
    feedforward: jnp.ndarray  # (N, nu) affine terms d_k


def lqr_tracking_solve(
    A: jnp.ndarray,        # (N, nx, nx)
    B: jnp.ndarray,        # (N, nx, nu)
    c: jnp.ndarray,        # (N, nx)
    q_diag: jnp.ndarray,   # (N+1, nx) stage + terminal state cost diagonals
    r_diag: jnp.ndarray,   # (nu,)
    x_ref: jnp.ndarray,    # (N+1, nx)
    u_ref: jnp.ndarray,    # (N, nu)
    x0: jnp.ndarray,       # (nx,)
) -> LQRSolution:
    """Exact unconstrained tracking LQR; one backward + one forward scan."""
    prec = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=prec)
    N, nx, nu = B.shape
    R = jnp.diag(r_diag)

    P_N = jnp.diag(q_diag[N])
    q_N = -q_diag[N] * x_ref[N]

    def backward(carry, inputs):
        P_next, q_next = carry
        A_k, B_k, c_k, qd_k, xr_k, ur_k = inputs

        BtP = mm(B_k.T, P_next)
        S = R + mm(BtP, B_k)                    # (nu, nu)
        S_chol = jnp.linalg.cholesky(S)
        K = jax.scipy.linalg.cho_solve((S_chol, True), mm(BtP, A_k))
        d = jax.scipy.linalg.cho_solve(
            (S_chol, True), mm(B_k.T, mm(P_next, c_k) + q_next) - r_diag * ur_k
        )

        A_cl = A_k - mm(B_k, K)
        P = jnp.diag(qd_k) + mm(A_k.T, mm(P_next, A_cl))
        P = 0.5 * (P + P.T)                     # keep symmetric
        q = mm(A_k.T, mm(P_next, c_k - mm(B_k, d)) + q_next) - qd_k * xr_k
        return (P, q), (K, d)

    (_, _), (Ks, ds) = jax.lax.scan(
        backward,
        (P_N, q_N),
        (A, B, c, q_diag[:N], x_ref[:N], u_ref),
        reverse=True,
    )

    def forward(x, inputs):
        A_k, B_k, c_k, K, d, ur_k = inputs
        u = -mm(K, x) - d
        x_next = mm(A_k, x) + mm(B_k, u) + c_k
        return x_next, (u, x_next)

    _, (U, X_tail) = jax.lax.scan(forward, x0, (A, B, c, Ks, ds, u_ref))
    X = jnp.concatenate([x0[None, :], X_tail], axis=0)
    return LQRSolution(U=U, X=X, gains=Ks, feedforward=ds)
