"""Remaining MPC variants: the RK4 demo MPC and the 9-state attitude MPC.

* ``RK4DemoMPC`` — ``/root/reference/src/px4/mpc_casadi_demo.py:44-767``:
  6-state / 3-control, RK4-discretised double integrator, a FULL reference
  trajectory parameter (all N+1 stages), NED altitude box.
  The RK4 of a double integrator is exact and closed-form
  (``A_d = I + dt A``, ``B_d = dt B + dt^2/2 A B`` — the nilpotent series
  truncates), so this is a *static* condensed QP like the flagship linear
  MPC: all matrices are compile-time constants, per-stage references are
  the only per-tick data.

* ``AttitudeMPC`` — ``/root/reference/src/px4/velocity_control.py:353-446``:
  9-state ``[pos, vel, euler]``, control ``[T, tau]`` with the reference's
  Euler-rate simplification (``d(euler)/dt = tau`` directly, :384-388),
  z-up thrust mapping, N+1 equal-weight terminal stage. Nonlinear in
  attitude -> runs on the generic SQP engine.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qp import admm_box_qp, condense_dynamics
from .mpc_sqp import QuadCost, SQPCarry, SQPConfig, SQPMPC


class DemoCarry(NamedTuple):
    slack: jnp.ndarray
    dual: jnp.ndarray


class RK4DemoMPC:
    """Static condensed QP with per-stage reference trajectory."""

    def __init__(
        self,
        dt: float = 0.1,
        horizon: int = 10,
        admm_iterations: int = 80,
        admm_rho: float = 4.0,
        dtype=jnp.float32,
    ):
        self.dt = dt
        self.N = N = horizon
        self.rho = admm_rho
        self.iterations = admm_iterations
        self.dtype = dtype
        nx, nu = 6, 3

        A_c = np.zeros((nx, nx))
        A_c[0:3, 3:6] = np.eye(3)
        B_c = np.zeros((nx, nu))
        B_c[3:6, :] = np.eye(3)
        # exact RK4 == exact discretisation (A_c is nilpotent of index 2)
        A = np.eye(nx) + dt * A_c
        B = dt * B_c + 0.5 * dt**2 * (A_c @ B_c)

        Sx, Su, _ = condense_dynamics(A, B, N)

        q = np.array([30.0, 30.0, 40.0, 15.0, 15.0, 20.0])   # :65
        r = np.array([2.5, 2.5, 1.0])                        # :66
        qbar = np.concatenate([np.tile(q, N - 1), 2.0 * q])  # Qf = 2 Q (:67)
        rbar = np.tile(r, N)

        H = Su.T @ (qbar[:, None] * Su) + np.diag(rbar)
        G = np.vstack([np.eye(N * nu), Su])
        M_inv = np.linalg.inv(H + admm_rho * (G.T @ G))

        cast = lambda a: np.asarray(a, np.dtype(jnp.dtype(dtype).name))
        self._Sx, self._Su = cast(Sx), cast(Su)
        self._SuT_q = cast(Su.T * qbar[None, :])
        self._G, self._M_inv = cast(G), cast(M_inv)
        # bounds: x,y +-50; NED z in [-5, -0.5]; v,a +-2.5 (:55-63)
        self._x_lo = cast(np.tile([-50, -50, -5.0, -2.5, -2.5, -2.5], N))
        self._x_hi = cast(np.tile([50, 50, -0.5, 2.5, 2.5, 2.5], N))
        self._u_lo = cast(np.full(N * nu, -2.5))
        self._u_hi = cast(np.full(N * nu, 2.5))
        self.n_constraints = G.shape[0]

    def init_carry(self) -> DemoCarry:
        return DemoCarry(
            slack=jnp.zeros(self.n_constraints, self.dtype),
            dual=jnp.zeros(self.n_constraints, self.dtype),
        )

    def solve(self, carry: DemoCarry, state: jnp.ndarray, X_ref: jnp.ndarray):
        """``X_ref (N+1, 6)`` per-stage references (``mpc_casadi_demo`` passes
        the whole trajectory as a parameter). Returns ``(u0, X_opt, carry)``."""
        mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
        x0 = state.astype(self.dtype)
        ref = X_ref[1:].astype(self.dtype).reshape(-1)

        offset = mm(self._Sx, x0)
        f = mm(self._SuT_q, offset - ref)
        lower = jnp.concatenate([self._u_lo, self._x_lo - offset])
        upper = jnp.concatenate([self._u_hi, self._x_hi - offset])

        sol = admm_box_qp(
            self._M_inv, self._G, f, lower, upper,
            carry.slack, carry.dual, self.rho, self.iterations,
        )
        N = self.N
        U = sol.slack[: N * 3].reshape(N, 3)
        X_tail = (offset + mm(self._Su, sol.primal)).reshape(N, 6)
        X_opt = jnp.concatenate([x0[None, :], X_tail], axis=0)
        return U[0], X_opt, DemoCarry(slack=sol.slack, dual=sol.dual)


def attitude_mpc_step(x, u, residual, dt=0.1, mass=1.5, gravity=9.81):
    """Forward-Euler step of the 9-state attitude model
    (``velocity_control.py:378-393``): z-up thrust mapping, Euler rates
    commanded directly by the torque channels (the reference's
    simplification)."""
    vel = x[3:6]
    phi, theta, psi = x[6], x[7], x[8]
    T, tau = u[0], u[1:4]

    ax = T / mass * (jnp.cos(phi) * jnp.sin(theta) * jnp.cos(psi)
                     + jnp.sin(phi) * jnp.sin(psi))
    ay = T / mass * (jnp.cos(phi) * jnp.sin(theta) * jnp.sin(psi)
                     - jnp.sin(phi) * jnp.cos(psi))
    az = T / mass * (jnp.cos(phi) * jnp.cos(theta)) - gravity

    deriv = jnp.concatenate([vel, jnp.stack([ax, ay, az]), tau])
    return x + dt * (deriv + residual)


class AttitudeMPC:
    """``velocity_control.OffboardControl.setup_mpc`` equivalent on the SQP
    engine (dt=0.1, N=10, mass=1.5; :127-133)."""

    def __init__(self, dt: float = 0.1, horizon: int = 10, mass: float = 1.5,
                 config: SQPConfig | None = None, dtype=jnp.float32):
        self.mass = mass
        mg = mass * 9.81
        self.u_hover = jnp.asarray([mg, 0.0, 0.0, 0.0], dtype)

        def step_fn(x, u, d):
            return attitude_mpc_step(x, u, d, dt=dt, mass=mass)

        cfg = config or SQPConfig(horizon=horizon, sqp_iterations=2,
                                  admm_iterations=100, admm_rho=0.05)
        BIG = 1e9
        self.mpc = SQPMPC(
            step_fn, state_dim=9, control_dim=4, config=cfg,
            state_lower=[-BIG] * 9, state_upper=[BIG] * 9,
            # thrust in [0, 2 m g], |tau| <= 1 (:438-446)
            control_lower=[0.0, -1.0, -1.0, -1.0],
            control_upper=[2.0 * mg, 1.0, 1.0, 1.0],
            dtype=dtype,
        )
        q = jnp.asarray([10.0, 10.0, 20.0, 1.0, 1.0, 1.0, 0.5, 0.5, 0.1], dtype)
        self.cost = QuadCost(
            q_stage=q,
            q_terminal=q,   # terminal stage uses the same Q (:410-412)
            r_control=jnp.asarray([0.1, 0.05, 0.05, 0.01], dtype),
            u_ref=jnp.zeros(4, dtype),
        )

    def init_carry(self, state9: jnp.ndarray) -> SQPCarry:
        return self.mpc.init_carry(state9, self.u_hover)

    def solve(self, carry, state9, target9):
        N = self.mpc.config.horizon
        x_ref = jnp.tile(target9[None, :].astype(state9.dtype), (N, 1))
        return self.mpc.solve(carry, state9, self.cost, x_ref)
