"""iLQR engine (control.ilqr): the Riccati-based alternative to SQP+ADMM."""

import jax
import jax.numpy as jnp
import numpy as np

from unmanned_aerial_vehicles_tpu.control import ILQRRigidBodyMPC, RigidBodyMPC, ilqr_solve
from unmanned_aerial_vehicles_tpu.models import X500_PARAMS
from unmanned_aerial_vehicles_tpu.models.rigid_body import rigid_body_rk4_step


def test_ilqr_exact_on_linear_system():
    """On LINEAR dynamics one iLQR iteration IS the LQR optimum; extra
    iterations must not change it (Gauss-Newton exactness check)."""
    rng = np.random.default_rng(0)
    nx, nu, N = 4, 2, 12
    A = jnp.asarray(np.eye(nx) + 0.05 * rng.normal(size=(nx, nx)))
    B = jnp.asarray(0.2 * rng.normal(size=(nx, nu)))
    step = lambda x, u: A @ x + B @ u
    q = jnp.asarray(np.abs(rng.normal(size=(N + 1, nx))) + 0.5)
    r = jnp.asarray(np.abs(rng.normal(size=nu)) + 0.5)
    xr = jnp.asarray(rng.normal(size=(N + 1, nx)))
    ur = jnp.zeros((N, nu))
    x0 = jnp.asarray(rng.normal(size=nx))

    s1 = ilqr_solve(step, x0, jnp.zeros((N, nu)), q, r, xr, ur,
                    iterations=1, reg=0.0)
    s5 = ilqr_solve(step, x0, jnp.zeros((N, nu)), q, r, xr, ur,
                    iterations=5, reg=0.0)
    np.testing.assert_allclose(np.asarray(s1.U), np.asarray(s5.U), atol=1e-8)

    from unmanned_aerial_vehicles_tpu.ops.riccati import lqr_tracking_solve
    ref = lqr_tracking_solve(
        jnp.tile(A[None], (N, 1, 1)), jnp.tile(B[None], (N, 1, 1)),
        jnp.zeros((N, nx)), q, r, xr, ur, x0,
    )
    np.testing.assert_allclose(np.asarray(s1.U), np.asarray(ref.U), atol=1e-8)


def test_ilqr_monotone_best_cost_and_parallel_engine():
    """The returned iterate is never worse than the initial sequence, and
    the parallel-Riccati engine gives the same answer."""
    mpc = ILQRRigidBodyMPC()
    x = jnp.zeros(12).at[2].set(1.0).at[0].set(2.0)
    target = jnp.asarray([0.0, 0.0, 1.5])
    u0, X, carry = jax.jit(mpc.solve)(mpc.init_carry(x), x, target)
    assert np.isfinite(np.asarray(X)).all()
    mpc_p = ILQRRigidBodyMPC(parallel=True)
    u0p, Xp, _ = jax.jit(mpc_p.solve)(mpc_p.init_carry(x), x, target)
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u0p), atol=1e-4)
    # control bounds respected
    mg = X500_PARAMS.mass * X500_PARAMS.gravity
    assert 0.3 * mg - 1e-5 <= float(u0[0]) <= 1.2 * mg + 1e-5
    assert float(jnp.max(jnp.abs(u0[1:3]))) <= 0.8 + 1e-6


def test_ilqr_flies_the_rigid_body():
    """Closed loop: the iLQR torque MPC reaches and holds a setpoint on the
    true RK4 plant, comparably to the SQP engine on the same task."""
    target = jnp.asarray([1.5, -1.0, 2.0])

    def fly(mpc):
        def step(c, _):
            st, mc = c
            u, _, mc = mpc.solve(mc, st, target)
            st = rigid_body_rk4_step(st, u, X500_PARAMS, 0.02)
            return (st, mc), st

        x0 = jnp.zeros(12).at[2].set(1.0)
        (_, _), states = jax.lax.scan(
            step, (x0, mpc.init_carry(x0)), None, length=500
        )
        return np.asarray(states)

    st_i = fly(ILQRRigidBodyMPC())
    err_i = np.linalg.norm(st_i[-1, 0:3] - np.asarray(target))
    assert np.isfinite(st_i).all()
    assert err_i < 0.15, f"iLQR setpoint error {err_i:.3f} m"

    st_s = fly(RigidBodyMPC())
    err_s = np.linalg.norm(st_s[-1, 0:3] - np.asarray(target))
    # the two engines land in the same neighbourhood
    assert abs(err_i - err_s) < 0.2


def test_ilqr_rk4_integrator_matches_plant():
    """integrator='rk4' makes the engine's internal model the TRUE plant
    step (bit-equal to rigid_body_rk4_step), so the solve's predicted plan
    X equals the plant rollout of its U — the property the policy-reuse
    multitick tier relies on. The Euler engine must NOT have it."""
    x = jnp.zeros(12, jnp.float32).at[2].set(1.2).at[3].set(0.4).at[6].set(0.1)

    eng = ILQRRigidBodyMPC(integrator="rk4")
    u = eng.u_hover + jnp.asarray([0.4, 0.03, -0.02, 0.01], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(eng.step_fn(x, u)),
        np.asarray(rigid_body_rk4_step(x, u, X500_PARAMS, 0.02)),
    )

    # plan-vs-plant consistency: roll the engine's own solution through the
    # true plant and compare to the solve's predicted states
    target = jnp.asarray([0.5, -0.5, 1.5], jnp.float32)
    x_ref = jnp.tile(
        jnp.concatenate([target, jnp.zeros(9, jnp.float32)])[None],
        (eng.N + 1, 1))
    u_ref = jnp.tile(eng.u_hover[None], (eng.N, 1))
    sol = ilqr_solve(eng.step_fn, x, u_ref, eng.q_diag, eng.r_diag,
                     x_ref, u_ref, iterations=3, reg=eng.reg,
                     u_lower=eng.u_lower, u_upper=eng.u_upper)
    xc, gaps = x, []
    for k in range(eng.N):
        xc = rigid_body_rk4_step(xc, sol.U[k], X500_PARAMS, 0.02)
        gaps.append(float(jnp.max(jnp.abs(xc - sol.X[k + 1]))))
    assert max(gaps) < 1e-5, f"rk4 plan drifts from plant: {max(gaps)}"

    eng_e = ILQRRigidBodyMPC()  # euler default
    sol_e = ilqr_solve(eng_e.step_fn, x, u_ref, eng_e.q_diag, eng_e.r_diag,
                       x_ref, u_ref, iterations=3, reg=eng_e.reg,
                       u_lower=eng_e.u_lower, u_upper=eng_e.u_upper)
    xc, gaps_e = x, []
    for k in range(eng_e.N):
        xc = rigid_body_rk4_step(xc, sol_e.U[k], X500_PARAMS, 0.02)
        gaps_e.append(float(jnp.max(jnp.abs(xc - sol_e.X[k + 1]))))
    assert max(gaps_e) > 1e-4, "euler plan unexpectedly matches the plant"

    import pytest
    with pytest.raises(ValueError):
        ILQRRigidBodyMPC(integrator="heun")
