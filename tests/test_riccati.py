"""Riccati LQR vs condensed-QP: the two solver families must agree exactly
on unconstrained problems."""

import jax
import jax.numpy as jnp
import numpy as np

from unmanned_aerial_vehicles_tpu.ops.qp import condense_ltv
from unmanned_aerial_vehicles_tpu.ops.riccati import lqr_tracking_solve


def _random_problem(rng, N=12, nx=6, nu=3):
    A = jnp.asarray(np.eye(nx) + 0.05 * rng.normal(size=(N, nx, nx)) * 0.3)
    B = jnp.asarray(0.1 * rng.normal(size=(N, nx, nu)))
    c = jnp.asarray(0.05 * rng.normal(size=(N, nx)))
    q_diag = jnp.asarray(np.abs(rng.normal(size=(N + 1, nx))) + 0.5)
    r_diag = jnp.asarray(np.abs(rng.normal(size=nu)) + 0.5)
    x_ref = jnp.asarray(rng.normal(size=(N + 1, nx)))
    u_ref = jnp.asarray(0.3 * rng.normal(size=(N, nu)))
    x0 = jnp.asarray(rng.normal(size=nx))
    return A, B, c, q_diag, r_diag, x_ref, u_ref, x0


def _condensed_optimum(A, B, c, q_diag, r_diag, x_ref, u_ref, x0):
    """Direct normal-equations solve of the same tracking QP in U-space."""
    N, nx, nu = B.shape
    Sx, Su, Sc = condense_ltv(A, B, c)
    qbar = q_diag[1:].reshape(-1)                   # stages 1..N
    rbar = jnp.tile(r_diag, N)
    ref = x_ref[1:].reshape(-1)
    uref = u_ref.reshape(-1)
    offset = Sx @ x0 + Sc
    H = Su.T @ (qbar[:, None] * Su) + jnp.diag(rbar)
    f = Su.T @ (qbar * (offset - ref)) - rbar * uref
    # NOTE: stage-0 state cost is constant wrt U in both formulations
    U = -jnp.linalg.solve(H, f)
    return U.reshape(N, nu)


def test_lqr_matches_condensed(rng):
    prob = _random_problem(rng)
    sol = lqr_tracking_solve(*prob)
    U_ref = _condensed_optimum(*prob)
    np.testing.assert_allclose(np.asarray(sol.U), np.asarray(U_ref), atol=1e-8)

    # trajectory consistency
    A, B, c, *_ , x0 = prob
    x = x0
    for k in range(B.shape[0]):
        x = A[k] @ x + B[k] @ sol.U[k] + c[k]
        np.testing.assert_allclose(np.asarray(sol.X[k + 1]), np.asarray(x), atol=1e-10)


def test_lqr_regulates_double_integrator(rng):
    """Sanity: drives a double integrator to the origin."""
    N, nx, nu = 40, 6, 3
    dt = 0.1
    A1 = np.eye(nx); A1[0:3, 3:6] = dt * np.eye(3)
    B1 = np.zeros((nx, nu)); B1[3:6, :] = dt * np.eye(3)
    A = jnp.asarray(np.tile(A1, (N, 1, 1)))
    B = jnp.asarray(np.tile(B1, (N, 1, 1)))
    c = jnp.zeros((N, nx))
    q_diag = jnp.ones((N + 1, nx))
    r_diag = 0.1 * jnp.ones(nu)
    x_ref = jnp.zeros((N + 1, nx))
    u_ref = jnp.zeros((N, nu))
    x0 = jnp.asarray(rng.normal(size=nx)) * 2.0

    sol = lqr_tracking_solve(A, B, c, q_diag, r_diag, x_ref, u_ref, x0)
    assert float(jnp.linalg.norm(sol.X[-1])) < 0.3 * float(jnp.linalg.norm(x0))


def test_lqr_vmaps_over_batch(rng):
    """Batched Riccati (the north-star phrasing): vmap over instances."""
    probs = [_random_problem(rng, N=8) for _ in range(4)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *probs)
    sols = jax.vmap(lqr_tracking_solve)(*stacked)
    for i in range(4):
        single = lqr_tracking_solve(*probs[i])
        np.testing.assert_allclose(
            np.asarray(sols.U[i]), np.asarray(single.U), atol=1e-10
        )


def test_parallel_riccati_matches_sequential():
    """Associative-scan LQR (ops.parallel_riccati) reproduces the sequential
    backward/forward scans to machine precision across horizons — including
    non-power-of-two lengths (odd-split scan tree). N={3, 37} covers the
    degenerate and odd-split trees; larger horizons only grow compile time
    (this was the slowest test in the suite at 89 s, VERDICT round-2 #10)."""
    from unmanned_aerial_vehicles_tpu.ops.parallel_riccati import (
        lqr_tracking_solve_parallel,
    )

    rng = np.random.default_rng(1)
    for N in (3, 37):
        nx, nu = 6, 4
        A = jnp.asarray(np.tile(np.eye(nx), (N, 1, 1))
                        + 0.05 * rng.normal(size=(N, nx, nx)))
        B = jnp.asarray(0.1 * rng.normal(size=(N, nx, nu)))
        c = jnp.asarray(0.05 * rng.normal(size=(N, nx)))
        qd = jnp.asarray(np.abs(rng.normal(size=(N + 1, nx))) + 0.5)
        rd = jnp.asarray(np.abs(rng.normal(size=nu)) + 0.5)
        xr = jnp.asarray(rng.normal(size=(N + 1, nx)))
        ur = jnp.asarray(0.3 * rng.normal(size=(N, nu)))
        x0 = jnp.asarray(rng.normal(size=nx))
        s = lqr_tracking_solve(A, B, c, qd, rd, xr, ur, x0)
        p = lqr_tracking_solve_parallel(A, B, c, qd, rd, xr, ur, x0)
        np.testing.assert_allclose(np.asarray(p.U), np.asarray(s.U),
                                   atol=1e-8, err_msg=f"N={N}")
        np.testing.assert_allclose(np.asarray(p.X), np.asarray(s.X),
                                   atol=1e-8, err_msg=f"N={N}")
        np.testing.assert_allclose(np.asarray(p.gains), np.asarray(s.gains),
                                   atol=1e-8, err_msg=f"N={N}")
