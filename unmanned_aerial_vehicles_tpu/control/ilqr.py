"""Fixed-iteration iLQR (Gauss-Newton) on the Riccati engine.

The second nonlinear-MPC family named in SURVEY.md section 7 stage 5
("SQP ... or iLQR with fixed iterations"). Where ``mpc_sqp.SQPMPC``
re-linearises and solves a condensed box-QP by ADMM, iLQR solves the
UNconstrained tracking subproblem exactly by Riccati (O(N) — or O(log N)
with the parallel solver) and handles control bounds by clamping the
updated sequence (box-DDP-lite). Per iteration:

    X       = rollout(U)                          (nonlinear, lax.scan)
    A_k,B_k = jacfwd(step)(X_k, U_k)              (vmapped)
    dU      = LQR(A, B, 0, Q, R+reg, xref-X, uref-U, dx0=0)
    U       <- clip(U + dU, lo, hi)

Everything is fixed-shape / fixed-iteration — no line searches, no
data-dependent branching — so a whole solve jits into one XLA program and
composes under scan/vmap like every other controller here. The
Levenberg-style ``reg`` on R keeps full steps stable without a search.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.parallel_riccati import lqr_tracking_solve_parallel
from ..ops.riccati import lqr_tracking_solve


class ILQRSolution(NamedTuple):
    U: jnp.ndarray        # (N, nu)
    X: jnp.ndarray        # (N+1, nx)
    cost: jnp.ndarray     # () tracking cost of the returned trajectory
    gains: jnp.ndarray    # (N, nu, nx) final LQR subproblem's feedback K_k


def _tracking_cost(X, U, q_diag, r_diag, x_ref, u_ref):
    ex = X - x_ref
    eu = U - u_ref
    return jnp.sum(q_diag * ex**2) + jnp.sum(r_diag * eu**2)


def ilqr_solve(
    step_fn: Callable,           # (x, u) -> x_next  (discrete dynamics)
    x0: jnp.ndarray,             # (nx,)
    U_init: jnp.ndarray,         # (N, nu) initial control sequence
    q_diag: jnp.ndarray,         # (N+1, nx) stage + terminal state weights
    r_diag: jnp.ndarray,         # (nu,)
    x_ref: jnp.ndarray,          # (N+1, nx)
    u_ref: jnp.ndarray,          # (N, nu)
    iterations: int = 8,
    reg: float = 1e-3,
    u_lower: jnp.ndarray | None = None,
    u_upper: jnp.ndarray | None = None,
    parallel: bool = False,
    rollout_fn: Callable | None = None,
) -> ILQRSolution:
    """Fixed-iteration iLQR for quadratic tracking costs.

    ``parallel=True`` solves each LQR subproblem with the associative-scan
    Riccati (worth it for long horizons). Returns the best-cost iterate —
    a late iteration can never make the answer worse.

    ``rollout_fn(x0, U) -> (N, nx)`` optionally replaces the serial
    ``lax.scan`` of ``step_fn`` for the forward rollouts (the solve's
    dominant cost when ``step_fn`` is an XLA RK4 chain: ~44 µs/step of
    tiny-op dispatch vs 0.6 µs in the fused plant kernel —
    ``ops.rigid_plant_pallas.rigid_body_rollout_fused``). It must match
    ``step_fn`` semantics (kernel-vs-XLA parity 2e-8/step is pinned by
    ``tests/test_rigid_plant_kernel.py``); linearisation stays a batched
    ``jacfwd`` of ``step_fn``.
    """
    N, nu = U_init.shape
    nx = x0.shape[0]
    lqr = lqr_tracking_solve_parallel if parallel else lqr_tracking_solve
    step_jac = jax.vmap(jax.jacfwd(step_fn, argnums=(0, 1)))

    def rollout(U):
        if rollout_fn is not None:
            X_tail = rollout_fn(x0, U)
        else:
            def body(x, u):
                xn = step_fn(x, u)
                return xn, xn

            _, X_tail = jax.lax.scan(body, x0, U)
        return jnp.concatenate([x0[None, :], X_tail], axis=0)

    zeros_c = jnp.zeros((N, nx), U_init.dtype)
    dx0 = jnp.zeros(nx, U_init.dtype)
    r_sub = r_diag + reg

    def clamp(U):
        if u_lower is not None:
            U = jnp.maximum(U, u_lower)
        if u_upper is not None:
            U = jnp.minimum(U, u_upper)
        return U

    def one_iter(carry, _):
        # X == rollout(U) is carried from the previous iteration: the
        # cost-evaluation rollout of iterate i IS the linearisation rollout
        # of iterate i+1, so each iteration runs exactly ONE serial rollout
        # chain (plus the backward/forward Riccati scans) — the iterates
        # are bit-identical to rolling out twice, at 3/4 the latency
        U, X, best_U, best_X, best_cost, best_K = carry
        A, B = step_jac(X[:-1], U)
        sol = lqr(
            A, B, zeros_c, q_diag, r_sub,
            x_ref - X, u_ref - U, dx0,
        )
        U_new = clamp(U + sol.U)
        X_new = rollout(U_new)
        cost = _tracking_cost(X_new, U_new, q_diag, r_diag, x_ref, u_ref)
        better = cost < best_cost
        best_U = jnp.where(better, U_new, best_U)
        best_X = jnp.where(better, X_new, best_X)
        # gains must track the SAME iterate as U/X: the policy-reuse tier
        # applies gains around (U_best, X_best), and gains linearised about
        # a rejected late iterate would be applied around a different
        # trajectory for a whole dispatch
        best_K = jnp.where(better, sol.gains, best_K)
        best_cost = jnp.minimum(cost, best_cost)
        return (U_new, X_new, best_U, best_X, best_cost, best_K), None

    X_init = rollout(U_init)
    init_cost = _tracking_cost(X_init, U_init, q_diag, r_diag, x_ref, u_ref)
    K_init = jnp.zeros((N, nu, nx), U_init.dtype)
    (_, _, U_best, X_best, cost_best, K_best), _ = jax.lax.scan(
        one_iter, (U_init, X_init, U_init, X_init, init_cost, K_init), None,
        length=iterations,
    )
    return ILQRSolution(U=U_best, X=X_best, cost=cost_best, gains=K_best)


def ilqr_optimality(
    step_fn: Callable,
    x0: jnp.ndarray,
    U: jnp.ndarray,              # (N, nu) candidate controls
    q_diag: jnp.ndarray,         # (N+1, nx)
    r_diag: jnp.ndarray,         # (nu,)
    x_ref: jnp.ndarray,
    u_ref: jnp.ndarray,
    u_lower: jnp.ndarray | None = None,
    u_upper: jnp.ndarray | None = None,
    tol: float = 1e-6,
) -> jnp.ndarray:
    """First-order optimality of an iLQR iterate: the projected-gradient
    KKT residual of ``min_U J(U) s.t. lo <= U <= hi``.

    ``J`` is the exact nonlinear tracking cost (gradient via autodiff
    through the rollout — independent of iLQR's own Riccati machinery).
    Componentwise residual: ``g_i`` on the interior, ``min(g_i, 0)`` at the
    upper bound, ``max(g_i, 0)`` at the lower bound (a bound may only hold
    back a gradient pushing past it). Zero exactly at a KKT point — the
    instrumentation that justifies iteration defaults by optimality rather
    than closed-loop RMS alone (VERDICT r3 weak #3)."""

    def rollout(U_):
        def body(x, u):
            xn = step_fn(x, u)
            return xn, xn

        _, X_tail = jax.lax.scan(body, x0, U_)
        return jnp.concatenate([x0[None, :], X_tail], axis=0)

    def cost(U_):
        return _tracking_cost(rollout(U_), U_, q_diag, r_diag, x_ref, u_ref)

    g = jax.grad(cost)(U)
    res = g
    if u_upper is not None:
        res = jnp.where(U >= u_upper - tol, jnp.minimum(g, 0.0), res)
    if u_lower is not None:
        res = jnp.where(U <= u_lower + tol, jnp.maximum(g, 0.0), res)
    return jnp.max(jnp.abs(res))


class ILQRCarry(NamedTuple):
    U_prev: jnp.ndarray   # (N, nu) warm start


class ILQRRigidBodyMPC:
    """The 12-state torque-MPC task (``mpc_FULL``'s costs/bounds, as in
    ``control.mpc_rigid.RigidBodyMPC``) solved by iLQR instead of
    SQP+ADMM — the alternative engine on the same problem, warm-started by
    shifting the previous control sequence.

    Default ``iterations=3``: like the ADMM controllers, the 50 Hz warm
    start carries convergence across ticks — measured on v5e, circle-task
    closed-loop RMS is IDENTICAL (0.6049 m) at 6/3/2/1 iterations while
    the tick costs 2749/1479/1056/469 µs; 3 keeps a safety margin over
    the single-iteration floor for cold transients.

    ``integrator="rk4"`` is the recommended FLIGHT configuration: the
    internal model becomes the true plant step and the solve's forward
    rollouts run in the fused Pallas plant kernel on TPU
    (``ops.rigid_plant_pallas``), which is simultaneously more accurate
    AND faster than the Euler default (staged tick 947 → ~354 µs at RMS
    0.5668 → 0.5081 on the bench circle task; the Euler default is kept
    for construction-cost-sensitive uses and historical parity rows)."""

    def __init__(self, dt: float = 0.02, horizon: int = 15,
                 iterations: int = 3, reg: float = 1e-2,
                 parallel: bool = False, dtype=jnp.float32,
                 integrator: str = "euler"):
        from ..models.params import X500_PARAMS
        from ..models.rigid_body import rigid_body_derivative, rigid_body_rk4_step

        self.params = X500_PARAMS
        mg = self.params.mass * self.params.gravity
        self.u_hover = jnp.asarray([mg, 0.0, 0.0, 0.0], dtype)
        self.N = horizon
        self.iterations = iterations
        self.reg = reg
        self.parallel = parallel
        self.dtype = dtype

        p = self.params

        # integrator="euler" (default) keeps the historical engine: cheap
        # per-stage jacfwd, but its plan drifts from the RK4 plant — the
        # policy-reuse tier inherits that drift as closed-loop RMS once K>2.
        # integrator="rk4" makes the internal model IDENTICAL to the plant
        # (rigid_body_rk4_step), so the dispatch plan is exact and the
        # per-tick feedback only has to absorb the moving reference.
        if integrator == "euler":
            def step(x, u):
                return x + dt * rigid_body_derivative(x, u, p)
        elif integrator == "rk4":
            def step(x, u):
                return rigid_body_rk4_step(x, u, p, dt)
        else:
            raise ValueError(f"unknown integrator {integrator!r}")
        self.integrator = integrator

        self.step_fn = step

        # kernel-backed forward rollouts for the RK4 engine: the solve is
        # rollout-dominated in XLA (N serial RK4 steps at ~44 µs each of
        # tiny-op dispatch); the fused plant kernel rolls the same chain at
        # 0.6 µs/step (parity 2e-8, tests/test_rigid_plant_kernel.py).
        # Only where Mosaic compiles (TPU backend — fixed once jax
        # initialises, so decided here); f64 engines (solver-parity tests)
        # and CPU/GPU keep ilqr_solve's pure-XLA scan (rollout_fn=None).
        self.rollout_fn = None
        if (integrator == "rk4" and dtype == jnp.float32
                and jax.default_backend() == "tpu"):
            from ..ops.rigid_plant_pallas import rigid_body_rollout_fused

            self.rollout_fn = lambda x0, U: rigid_body_rollout_fused(
                x0, U, p, dt, interpret=False)

        # costs: mpc_FULL.py:264-276 / :352-360 (same as RigidBodyMPC)
        q = jnp.asarray(
            [12.0, 12.0, 18.0, 3.0, 3.0, 4.0, 2.0, 2.0, 1.5, 0.3, 0.3, 0.3],
            dtype,
        )
        term = jnp.asarray([2.5] * 3 + [1.5] * 3 + [1.5] * 3 + [0.8] * 3, dtype)
        self.q_diag = jnp.concatenate([jnp.tile(q[None], (horizon, 1)),
                                       (q * term)[None]], axis=0)
        self.r_diag = jnp.asarray([0.5, 0.1, 0.1, 0.1], dtype)
        self.u_lower = jnp.asarray([0.3 * mg, -0.8, -0.8, -0.4], dtype)
        self.u_upper = jnp.asarray([1.2 * mg, 0.8, 0.8, 0.4], dtype)

    def init_carry(self, state12) -> ILQRCarry:
        return ILQRCarry(
            U_prev=jnp.tile(self.u_hover[None, :], (self.N, 1))
        )

    def solve(self, carry: ILQRCarry, state12, target_pos, target_yaw=0.0
              ) -> Tuple[jnp.ndarray, jnp.ndarray, ILQRCarry]:
        x = state12.astype(self.dtype)
        N = self.N
        x_ref_stage = jnp.concatenate(
            [jnp.asarray(target_pos, self.dtype), jnp.zeros(3, self.dtype),
             jnp.stack([jnp.zeros((), self.dtype), jnp.zeros((), self.dtype),
                        jnp.asarray(target_yaw, self.dtype)]),
             jnp.zeros(3, self.dtype)]
        )
        x_ref = jnp.tile(x_ref_stage[None, :], (N + 1, 1))
        u_ref = jnp.tile(self.u_hover[None, :], (N, 1))

        U0 = jnp.concatenate([carry.U_prev[1:], carry.U_prev[-1:]], axis=0)
        sol = ilqr_solve(
            self.step_fn, x, U0, self.q_diag, self.r_diag, x_ref, u_ref,
            iterations=self.iterations, reg=self.reg,
            u_lower=self.u_lower, u_upper=self.u_upper,
            parallel=self.parallel, rollout_fn=self.rollout_fn,
        )
        return sol.U[0], sol.X, ILQRCarry(U_prev=sol.U)
