"""Box-QP solver correctness: analytic unconstrained optimum, scipy
high-accuracy references, KKT residuals."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from unmanned_aerial_vehicles_tpu.ops.qp import (
    admm_box_qp,
    condense_dynamics,
    kkt_residuals,
)


def _random_qp(rng, n=30, m=None):
    m = m or n
    Q = rng.normal(size=(n, n))
    H = Q @ Q.T + n * np.eye(n)  # well-conditioned SPD
    f = rng.normal(size=n) * 10.0
    G = np.vstack([np.eye(n), rng.normal(size=(m - n, n))]) if m > n else np.eye(n)
    return H, f, G


def _solve_ours(H, f, G, lo, hi, rho=10.0, iters=400):
    M_inv = np.linalg.inv(H + rho * G.T @ G)
    sol = admm_box_qp(
        jnp.asarray(M_inv),
        jnp.asarray(G),
        jnp.asarray(f),
        jnp.asarray(lo),
        jnp.asarray(hi),
        jnp.zeros(G.shape[0]),
        jnp.zeros(G.shape[0]),
        rho,
        iters,
    )
    return sol


def test_unconstrained_matches_analytic(rng):
    H, f, G = _random_qp(rng, n=24)
    lo = -1e6 * np.ones(G.shape[0])
    hi = 1e6 * np.ones(G.shape[0])
    sol = _solve_ours(H, f, G, lo, hi)
    expected = -np.linalg.solve(H, f)
    np.testing.assert_allclose(np.asarray(sol.primal), expected, atol=1e-8)


def test_box_constrained_matches_lbfgsb(rng):
    """G = I: pure box-QP; scipy L-BFGS-B at tight tolerance is ground truth."""
    H, f, _ = _random_qp(rng, n=40)
    f = f * 20.0  # push the unconstrained optimum well outside the box
    G = np.eye(40)
    lo, hi = -0.5 * np.ones(40), 0.5 * np.ones(40)

    ref = scipy.optimize.minimize(
        lambda u: 0.5 * u @ H @ u + f @ u,
        np.zeros(40),
        jac=lambda u: H @ u + f,
        method="L-BFGS-B",
        bounds=list(zip(lo, hi)),
        options={"ftol": 1e-18, "gtol": 1e-14, "maxiter": 5000},
    )
    sol = _solve_ours(H, f, G, lo, hi, iters=800)
    assert np.any(np.isclose(np.abs(ref.x), 0.5, atol=1e-9)), "want active bounds"
    np.testing.assert_allclose(np.asarray(sol.primal), ref.x, atol=1e-6)


def test_general_constraints_match_slsqp(rng):
    """Dense G with active rows; SLSQP as independent reference."""
    n, m = 12, 20
    H, f, _ = _random_qp(rng, n=n)
    G = rng.normal(size=(m, n))
    lo, hi = -0.3 * np.ones(m), 0.3 * np.ones(m)

    cons = [
        {"type": "ineq", "fun": lambda u: hi - G @ u, "jac": lambda u: -G},
        {"type": "ineq", "fun": lambda u: G @ u - lo, "jac": lambda u: G},
    ]
    ref = scipy.optimize.minimize(
        lambda u: 0.5 * u @ H @ u + f @ u,
        np.zeros(n),
        jac=lambda u: H @ u + f,
        method="SLSQP",
        constraints=cons,
        options={"ftol": 1e-14, "maxiter": 2000},
    )
    sol = _solve_ours(H, f, G, lo, hi, iters=2000, rho=20.0)
    np.testing.assert_allclose(np.asarray(sol.primal), ref.x, atol=5e-5)

    p_res, d_res = kkt_residuals(
        jnp.asarray(H), jnp.asarray(G), jnp.asarray(f), jnp.asarray(lo),
        jnp.asarray(hi), sol,
    )
    assert float(p_res) < 1e-6
    assert float(d_res) < 1e-4 * max(1.0, float(np.linalg.norm(f)))


def test_condense_dynamics_prediction(rng):
    """Condensed prediction == step-by-step simulation."""
    nx, nu, N = 6, 4, 10
    A = np.eye(nx) + 0.02 * rng.normal(size=(nx, nx)) * 0.5
    B = 0.02 * rng.normal(size=(nx, nu))
    Sx, Su, Sw = condense_dynamics(A, B, N)

    x0 = rng.normal(size=nx)
    U = rng.normal(size=(N, nu))
    W = rng.normal(size=(N, nx)) * 0.1

    X_pred = (Sx @ x0 + Su @ U.reshape(-1) + Sw @ W.reshape(-1)).reshape(N, nx)

    x = x0
    for k in range(N):
        x = A @ x + B @ U[k] + W[k]
        np.testing.assert_allclose(X_pred[k], x, atol=1e-12)


def test_ip_box_qp_matches_reference(rng):
    """Fixed-iteration interior point (the Ipopt-semantics tier) solves a
    random strictly convex box QP to 1e-8 of scipy trust-constr, including
    placeholder 'infinite' (1e9) rows."""
    from scipy.optimize import LinearConstraint, minimize

    from unmanned_aerial_vehicles_tpu.ops.qp import ip_box_qp, kkt_score

    n, m = 24, 60
    A = rng.standard_normal((n, n))
    H = A @ A.T + 0.5 * np.eye(n)
    G = rng.standard_normal((m, n))
    f = rng.standard_normal(n)
    center = G @ rng.standard_normal(n) * 0.1
    lo = center - rng.uniform(0.1, 1.0, m)
    hi = center + rng.uniform(0.1, 1.0, m)
    # a few unbounded placeholder rows
    lo[:5] = -1e9
    hi[-5:] = 1e9

    Hj, Gj, fj = jnp.asarray(H), jnp.asarray(G), jnp.asarray(f)
    loj, hij = jnp.asarray(lo), jnp.asarray(hi)
    sol = jax.jit(lambda: ip_box_qp(Hj, Gj, fj, loj, hij, iterations=50))()
    assert float(kkt_score(Hj, Gj, fj, loj, hij, sol.primal, sol.dual)) < 1e-8

    lo_inf = np.where(lo < -1e8, -np.inf, lo)
    hi_inf = np.where(hi > 1e8, np.inf, hi)
    res = minimize(
        lambda x: 0.5 * x @ H @ x + f @ x,
        np.zeros(n),
        jac=lambda x: H @ x + f,
        method="trust-constr",
        constraints=[LinearConstraint(G, lo_inf, hi_inf)],
        options=dict(gtol=1e-12, xtol=1e-14, maxiter=2000),
    )
    np.testing.assert_allclose(np.asarray(sol.primal), res.x, atol=1e-7)
