#!/usr/bin/env python3
"""Per-controller tick-latency benchmark on TPU (the whole controller family).

The headline bench (bench.py) covers the flagship 6-state GP-MPC tiers;
this tool measures EVERY controller's closed-loop tick on the real chip —
the reference's full L2 inventory (cascade PID, 12-state SQP MPC,
direct-rate MPC, LTV tracking MPC, iLQR, MPPI) plus the EKF estimation
tick — against the same implied real-time budget (<20 ms/solve at 50 Hz,
``src/px4/mpc.py:1868``). Slope-measured between two scan lengths so the
fixed tunnel dispatch round-trip cancels (see bench.py).

Writes ``artifacts/controller_latency.json``:
  {controller: {"us_per_tick": ..., "rms_pos_m": ...}}

Run:  PYTHONPATH=. python tools/bench_controllers.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from unmanned_aerial_vehicles_tpu.control import (
    ILQRRigidBodyMPC,
    MPPIController,
    RigidBodyMPC,
)
from unmanned_aerial_vehicles_tpu.control.mpc_linear import LinearMPC, LinearMPCConfig
from unmanned_aerial_vehicles_tpu.control.mpc_rigid import DirectRateMPC, LTVTrackingMPC
from unmanned_aerial_vehicles_tpu.estimation import noisy_mpc_flight_rollout
from unmanned_aerial_vehicles_tpu.loop import (
    FlightLoopConfig,
    mpc_flight_rollout,
    pid_flight_rollout,
)
from unmanned_aerial_vehicles_tpu.models import (
    X500_PARAMS,
    rigid_body_rk4_step,  # noqa: F401 (kept for parity experiments)
)
from unmanned_aerial_vehicles_tpu.ops.rigid_plant_pallas import (
    rigid_body_rk4_step_fast,
    rigid_body_rollout_fused,
)
from unmanned_aerial_vehicles_tpu.trajectories import ramped_circle_reference

T_SHORT, T_LONG = 400, 2000
CFG = FlightLoopConfig()
BUDGET_US = 20_000.0


def ref(t):
    pos, _, yaw = ramped_circle_reference(t, amplitude=2.0,
                                          height=CFG.takeoff_height)
    return pos, yaw


def slope_and_rms(make_run, reps=3):
    times = {}
    rms = None
    for T in (T_SHORT, T_LONG):
        run = make_run(T)
        r = float(run(jnp.float32(0.0)))
        if T == T_SHORT:
            rms = r
        best = float("inf")
        for rep in range(reps):
            t0 = time.perf_counter()
            float(run(jnp.float32(0.01 * (rep + 1))))
            best = min(best, time.perf_counter() - t0)
        times[T] = best
    us = (times[T_LONG] - times[T_SHORT]) / (T_LONG - T_SHORT) * 1e6
    return us, rms


def rollout_12state(controller_factory):
    """Generic 12-state closed loop (the cli fly12 shape): controller on the
    z-up rigid body plant."""

    def make_run(T):
        ctrl = controller_factory()

        @jax.jit
        def run(x_jitter):
            def step(c, i):
                st, mc = c
                t = i.astype(jnp.float32) * CFG.control_dt
                pos_ref, yaw_ref = ref(t)
                u, _, mc = ctrl.solve(
                    mc, st, jnp.asarray(pos_ref, jnp.float32),
                    jnp.asarray(yaw_ref, jnp.float32),
                )
                # fused plant kernel (ops.rigid_plant_pallas): same RK4 to
                # 2e-8, 0.6 us vs 44 us staged — the XLA step dominated
                # every 12-state row's tick before round 5
                st = rigid_body_rk4_step_fast(st, u, X500_PARAMS,
                                              CFG.control_dt)
                return (st, mc), jnp.sum((st[0:3] - pos_ref) ** 2)

            x0 = (jnp.zeros(12, jnp.float32)
                  .at[2].set(CFG.takeoff_height).at[0].set(x_jitter))
            (_, _), errs = jax.lax.scan(
                step, (x0, ctrl.init_carry(x0)), jnp.arange(T)
            )
            return jnp.sqrt(jnp.mean(errs))

        return run

    return make_run


def main():
    results = {}
    # --only ROW[,ROW]: measure a subset and MERGE into the existing
    # artifact (adding one row without re-rolling every other row's
    # number under the tunnel's ±10% run-to-run noise)
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    def record(name, make_run):
        if only is not None and name not in only:
            return
        us, rms = slope_and_rms(make_run)
        results[name] = {
            "us_per_tick": round(us, 2),
            "rms_pos_m": round(rms, 4),
            "vs_20ms_budget": round(us / BUDGET_US, 6),
        }
        print(name, json.dumps(results[name]))

    # cascade PID (9 loops) on the surrogate plant
    def make_pid(T):
        @jax.jit
        def run(x_jitter):
            x0 = (jnp.zeros(12, jnp.float32)
                  .at[2].set(CFG.takeoff_height).at[0].set(x_jitter))
            outs = pid_flight_rollout(ref, T, cfg=CFG, initial_state=x0)
            e = outs["pos_ref"] - outs["state"][:, 0:3]
            return jnp.sqrt(jnp.mean(jnp.sum(e**2, -1)))

        return run

    record("cascade_pid", make_pid)

    # 6-state linear MPC, staged XLA path (the non-fused baseline tier)
    mpc6 = LinearMPC(LinearMPCConfig(horizon=20, admm_iterations=10))

    def make_mpc6(T):
        @jax.jit
        def run(x_jitter):
            x0 = (jnp.zeros(12, jnp.float32)
                  .at[2].set(CFG.takeoff_height).at[0].set(x_jitter))
            outs = mpc_flight_rollout(mpc6, ref, T, cfg=CFG,
                                      initial_state=x0)
            e = outs["pos_ref"] - outs["state"][:, 0:3]
            return jnp.sqrt(jnp.mean(jnp.sum(e**2, -1)))

        return run

    record("linear_mpc_staged", make_mpc6)

    # 12-state family
    record("sqp_mpc12", rollout_12state(lambda: RigidBodyMPC()))
    record("ilqr12", rollout_12state(lambda: ILQRRigidBodyMPC()))
    # default MPPI flies the fused sampling kernel (ops.mppi_pallas: all
    # 512 rollouts + stage costs in ONE dispatch); the _xla_vmap row keeps
    # the vmapped-scan baseline it replaced (u0 parity 2e-5)
    record("mppi12_512rollouts", rollout_12state(lambda: MPPIController()))
    from unmanned_aerial_vehicles_tpu.control import MPPIConfig

    record("mppi12_512rollouts_xla_vmap",
           rollout_12state(lambda: MPPIController(
               MPPIConfig(fused_rollouts=False))))

    # direct-rate MPC flies ITS OWN plant model (rate-command inputs, not
    # torques — tests/test_mpc_sqp.py idiom)
    from unmanned_aerial_vehicles_tpu.control.mpc_rigid import direct_rate_step

    def make_direct_rate(T):
        ctrl = DirectRateMPC()

        @jax.jit
        def run(x_jitter):
            def step(c, i):
                st, mc = c
                t = i.astype(jnp.float32) * CFG.control_dt
                pos_ref, _ = ref(t)
                u, _, mc = ctrl.solve(mc, st, jnp.asarray(pos_ref, jnp.float32))
                st = direct_rate_step(st, u, jnp.zeros(12, jnp.float32),
                                      dt=CFG.control_dt)
                return (st, mc), jnp.sum((st[0:3] - pos_ref) ** 2)

            x0 = (jnp.zeros(12, jnp.float32)
                  .at[2].set(CFG.takeoff_height).at[0].set(x_jitter))
            (_, _), errs = jax.lax.scan(
                step, (x0, ctrl.init_carry(x0)), jnp.arange(T)
            )
            return jnp.sqrt(jnp.mean(errs))

        return run

    record("direct_rate_mpc12", make_direct_rate)

    # ---- 12-state multi-tick tiers (loop.rigid_loop): relinearise/solve
    # once per dispatch, frozen equilibration / LQR policy per tick ----
    from unmanned_aerial_vehicles_tpu.loop.rigid_loop import (
        ilqr_multitick_rollout,
        sqp_multitick_rollout,
    )

    # plan_roll="linear": re-anchor the warm plan with the dispatch's own
    # LTV prediction instead of the sequential nonlinear roll — measured
    # RMS-IDENTICAL on this task (0.5704/0.5704 sqp, 0.2470/0.2470
    # direct-rate at 4 d.p.) at ~half the tick cost; the obstacle row
    # below keeps the kernel-backed nonlinear roll (anchor quality governs
    # the detour homotopy there — NOTES round-5 session 2)
    def make_sqp_multitick(ctrl_factory, plant, K=8, iters=30):
        def make_run(T):
            ctrl = ctrl_factory()
            N = ctrl.mpc.config.horizon

            def reference_fn(ticks):
                ts = ticks.astype(jnp.float32) * CFG.control_dt
                pos = jax.vmap(lambda t: ref(t)[0])(ts)
                stage = jnp.concatenate(
                    [pos, jnp.zeros((ts.shape[0], 9))], axis=1
                )
                return jnp.tile(stage[:, None, :], (1, N, 1))

            @jax.jit
            def run(x_jitter):
                x0 = (jnp.zeros(12, jnp.float32)
                      .at[2].set(CFG.takeoff_height).at[0].set(x_jitter))
                outs = sqp_multitick_rollout(
                    ctrl.mpc, ctrl.cost, reference_fn, plant, x0, T,
                    ticks_per_dispatch=K, admm_iterations=iters,
                    u_init=ctrl.u_hover, plan_roll="linear",
                )
                ts = jnp.arange(T, dtype=jnp.float32) * CFG.control_dt
                pos_refs = jax.vmap(lambda t: ref(t)[0])(ts)
                e = outs["state"][:, 0:3] - pos_refs
                return jnp.sqrt(jnp.mean(jnp.sum(e**2, -1)))

            return run

        return make_run

    record("sqp_mpc12_multitick", make_sqp_multitick(
        RigidBodyMPC,
        lambda x, u: rigid_body_rk4_step_fast(x, u, X500_PARAMS,
                                              CFG.control_dt),
    ))
    record("direct_rate_mpc12_multitick", make_sqp_multitick(
        DirectRateMPC,
        lambda x, u: direct_rate_step(x, u, jnp.zeros(12, jnp.float32),
                                      dt=CFG.control_dt),
    ))

    # ---- fused direct-rate multitick (ops.rigid_tick_pallas): the same
    # tier with the per-tick chain (shift + condensed ADMM + plant) in ONE
    # Pallas kernel; per-dispatch relinearisation stays in XLA ----
    from unmanned_aerial_vehicles_tpu.loop.rigid_loop import (
        direct_rate_multitick_fused,
    )

    def make_dr_fused(K, iters):
        def make_run(T):
            ctrl = DirectRateMPC()
            N = ctrl.mpc.config.horizon

            def reference_fn(ticks):
                ts = ticks.astype(jnp.float32) * CFG.control_dt
                pos = jax.vmap(lambda t: ref(t)[0])(ts)
                stage = jnp.concatenate(
                    [pos, jnp.zeros((ts.shape[0], 9))], axis=1
                )
                return jnp.tile(stage[:, None, :], (1, N, 1))

            @jax.jit
            def run(x_jitter):
                x0 = (jnp.zeros(12, jnp.float32)
                      .at[2].set(CFG.takeoff_height).at[0].set(x_jitter))
                outs = direct_rate_multitick_fused(
                    ctrl.mpc, ctrl.cost, reference_fn, x0, T,
                    ticks_per_dispatch=K, admm_iterations=iters,
                    u_init=ctrl.u_hover, dt=CFG.control_dt,
                    plan_roll="linear",
                )
                ts = jnp.arange(T, dtype=jnp.float32) * CFG.control_dt
                pos_refs = jax.vmap(lambda t: ref(t)[0])(ts)
                e = outs["state"][:, 0:3] - pos_refs
                return jnp.sqrt(jnp.mean(jnp.sum(e**2, -1)))

            return run

        return make_run

    # apples-to-apples with the staged tier (K=8, iters=30), plus the
    # measured-safe low-latency point: cross-tick dual warm start makes
    # closed-loop RMS iteration-invariant down to 5 (0.2670-0.2673 m
    # across K in {8,20} x iters in {5,10,15,30} on v5e), so K=20/iters=10
    # is RMS-identical at ~2.8x lower latency
    record("direct_rate_mpc12_multitick_fused", make_dr_fused(8, 30))
    record("direct_rate_mpc12_multitick_fused_k20_i10",
           make_dr_fused(20, 10))

    # ---- fused TORQUE-SQP multitick: same kernel with the in-kernel plant
    # swapped for RK4 of the rigid body (shared make_plant_math) ----
    from unmanned_aerial_vehicles_tpu.loop.rigid_loop import (
        rigid_multitick_fused,
    )

    def make_rigid_fused(K, iters):
        def make_run(T):
            ctrl = RigidBodyMPC()
            N = ctrl.mpc.config.horizon

            def reference_fn(ticks):
                ts = ticks.astype(jnp.float32) * CFG.control_dt
                pos = jax.vmap(lambda t: ref(t)[0])(ts)
                stage = jnp.concatenate(
                    [pos, jnp.zeros((ts.shape[0], 9))], axis=1
                )
                return jnp.tile(stage[:, None, :], (1, N, 1))

            @jax.jit
            def run(x_jitter):
                x0 = (jnp.zeros(12, jnp.float32)
                      .at[2].set(CFG.takeoff_height).at[0].set(x_jitter))
                outs = rigid_multitick_fused(
                    ctrl.mpc, ctrl.cost, reference_fn, x0, T,
                    ticks_per_dispatch=K, admm_iterations=iters,
                    u_init=ctrl.u_hover, dt=CFG.control_dt,
                    plan_roll="linear",
                )
                ts = jnp.arange(T, dtype=jnp.float32) * CFG.control_dt
                pos_refs = jax.vmap(lambda t: ref(t)[0])(ts)
                e = outs["state"][:, 0:3] - pos_refs
                return jnp.sqrt(jnp.mean(jnp.sum(e**2, -1)))

            return run

        return make_run

    record("sqp_mpc12_multitick_fused", make_rigid_fused(8, 30))
    record("sqp_mpc12_multitick_fused_k20_i10", make_rigid_fused(20, 10))

    def make_ilqr_multitick(T, iters=3, integrator="euler", K=2):
        ctrl = ILQRRigidBodyMPC(iterations=iters, integrator=integrator)
        plant = lambda x, u: rigid_body_rk4_step_fast(x, u, X500_PARAMS,
                                                      CFG.control_dt)

        def position_ref_fn(ticks):
            ts = ticks.astype(jnp.float32) * CFG.control_dt
            return jax.vmap(lambda t: ref(t)[0])(ts)

        @jax.jit
        def run(x_jitter):
            x0 = (jnp.zeros(12, jnp.float32)
                  .at[2].set(CFG.takeoff_height).at[0].set(x_jitter))
            outs = ilqr_multitick_rollout(
                ctrl, position_ref_fn, plant, x0, T, ticks_per_dispatch=K,
            )
            ts = jnp.arange(T, dtype=jnp.float32) * CFG.control_dt
            pos_refs = jax.vmap(lambda t: ref(t)[0])(ts)
            e = outs["state"][:, 0:3] - pos_refs
            return jnp.sqrt(jnp.mean(jnp.sum(e**2, -1)))

        return run

    record("ilqr12_multitick_policy", make_ilqr_multitick)
    # warm-start iteration invariance at dispatch granularity (the ADMM/SQP
    # result repeats): RMS identical at 1 iteration, ~2x cheaper again
    record("ilqr12_multitick_policy_1iter",
           lambda T: make_ilqr_multitick(T, iters=1))

    # rk4 engine (internal model == the true plant, kernel-backed rollouts):
    # strictly dominates the Euler rows above — the staged per-tick engine
    # goes 947 -> ~354 us at RMS 0.5668 -> 0.5081, and the K=2 policy tier
    # flies at ~76 us/tick BELOW the staged Euler engine's RMS (the
    # prediction drift that bounded the Euler policy tier at K=2 is gone)
    record("ilqr12_rk4_staged",
           rollout_12state(lambda: ILQRRigidBodyMPC(integrator="rk4")))
    record("ilqr12_multitick_rk4_k2",
           lambda T: make_ilqr_multitick(T, iters=1, integrator="rk4", K=2))
    record("ilqr12_multitick_rk4_k8",
           lambda T: make_ilqr_multitick(T, iters=1, integrator="rk4", K=8))

    # LTV tracking MPC: its own idiom — (N+1, 12) shifting stage references
    # at 10 Hz on the GZ plant (tests/test_ltv_flight.py)
    from unmanned_aerial_vehicles_tpu.models import GZ_QUADROTOR_PARAMS

    def make_ltv(T):
        mpc = LTVTrackingMPC()
        N = mpc.mpc.config.horizon
        DT = 0.1

        def ref12(t):
            w = 2.0 * jnp.pi / 20.0
            r = jnp.zeros(12, jnp.float32)
            r = r.at[0].set(1.5 * jnp.cos(w * t))
            r = r.at[1].set(1.5 * jnp.sin(w * t))
            r = r.at[2].set(1.0)
            r = r.at[3].set(-1.5 * w * jnp.sin(w * t))
            r = r.at[4].set(1.5 * w * jnp.cos(w * t))
            return r

        @jax.jit
        def run(x_jitter):
            def step(c, i):
                st, mc = c
                ts = (i + jnp.arange(N + 1)).astype(jnp.float32) * DT
                window = jax.vmap(ref12)(ts)
                u, _, mc = mpc.solve(mc, st, window)
                st2 = rigid_body_rk4_step_fast(
                    st, u, GZ_QUADROTOR_PARAMS, DT, substeps=2)
                return (st2, mc), jnp.sum((st2[0:3] - window[0, 0:3]) ** 2)

            x0 = ref12(0.0).at[0].add(x_jitter)
            (_, _), errs = jax.lax.scan(
                step, (x0, mpc.init_carry(x0)), jnp.arange(T)
            )
            return jnp.sqrt(jnp.mean(errs))

        return run

    record("ltv_mpc12_10hz", make_ltv)

    # obstacle-constrained flight on the multitick tier (VERDICT round-4
    # #3 'done' bar: <100 us/tick with detour parity — the parity test is
    # tests/test_rigid_multitick.py::test_multitick_obstacle_detour): the
    # same LTV engine with one reserved spherical row, circle reference
    # with the obstacle ON the path, so the rows stay ACTIVE every lap
    def make_ltv_obstacle(T):
        mpc = LTVTrackingMPC(num_obstacles=1, obstacle_margin=0.2)
        N = mpc.mpc.config.horizon
        DT = 0.1
        # quarter-lap ahead of the start (1.5, 0, 1): ON the path so the
        # rows go active every lap, but away from x0 (starting inside the
        # sphere makes the linearised normal degenerate)
        obstacle = jnp.asarray([[0.0, 1.5, 1.0, 0.3]], jnp.float32)

        def ref12(t):
            w = 2.0 * jnp.pi / 20.0
            r = jnp.zeros(12, jnp.float32)
            r = r.at[0].set(1.5 * jnp.cos(w * t))
            r = r.at[1].set(1.5 * jnp.sin(w * t))
            r = r.at[2].set(1.0)
            r = r.at[3].set(-1.5 * w * jnp.sin(w * t))
            r = r.at[4].set(1.5 * w * jnp.cos(w * t))
            return r

        def reference_fn(ticks):
            def one(i):
                ts = (i + 1 + jnp.arange(N)).astype(jnp.float32) * DT
                return jax.vmap(ref12)(ts)
            return jax.vmap(one)(ticks)

        def plant(x, u):
            return rigid_body_rk4_step_fast(
                x, u, GZ_QUADROTOR_PARAMS, DT, substeps=2)

        def plan_roll_fn(x_fin, U_fin, residuals):
            # kernel-backed nonlinear re-anchor (= scan of the LTV
            # step_fn at zero residual, 7e-7 parity, ~18 us vs ~0.9 ms)
            return rigid_body_rollout_fused(
                x_fin, U_fin, GZ_QUADROTOR_PARAMS, DT)

        # K=2 / 100 iterations is the STABILITY-validated configuration
        # (7 jitters x 10 laps on chip: rms_max 0.146, clear 0.500) — the
        # dispatch-frozen obstacle normals flip the detour homotopy if
        # re-anchored more rarely (K=4 excursions, K=8 inversion/NaN; see
        # NOTES round-5 session 2). The attitude-recovery fallback is the
        # reference's solver-failure emergency hover semantics.
        from unmanned_aerial_vehicles_tpu.loop.rigid_loop import (
            make_attitude_recovery_fallback,
        )

        @jax.jit
        def run(x_jitter):
            x0 = ref12(0.0).at[0].add(x_jitter)
            outs = sqp_multitick_rollout(
                mpc.mpc, mpc.cost, reference_fn, plant, x0, T,
                ticks_per_dispatch=2, admm_iterations=100,
                u_init=mpc.u_hover, obstacles=obstacle,
                plan_roll_fn=plan_roll_fn,
                fallback_fn=make_attitude_recovery_fallback(
                    GZ_QUADROTOR_PARAMS),
            )
            ts = jnp.arange(T, dtype=jnp.float32) * DT
            refs = jax.vmap(ref12)(ts)
            e = outs["state"][:, 0:3] - refs[:, 0:3]
            return jnp.sqrt(jnp.mean(jnp.sum(e**2, -1)))

        return run

    record("ltv_obstacle_multitick", make_ltv_obstacle)

    # estimator-in-the-loop tick (sensors -> EKF -> MPC -> plant): the EKF
    # runs INSIDE the multi-tick kernel (padded-P Riccati dots + sequential
    # scalar measurement fusions, ops.tick_pallas)
    mpc_f = LinearMPC(
        LinearMPCConfig(horizon=20, admm_iterations=10,
                        use_fused_controller=True)
    )

    def make_noisy(T):
        @jax.jit
        def run(x_jitter):
            x0 = (jnp.zeros(12, jnp.float32)
                  .at[2].set(CFG.takeoff_height).at[0].set(x_jitter))
            outs = noisy_mpc_flight_rollout(
                mpc_f, ref, T, jax.random.PRNGKey(0),
                cfg=FlightLoopConfig(use_fused_tick=True,
                                     ticks_per_dispatch=20,
                                     fused_tick_loop_precision="default"),
                initial_state=x0,
            )
            e = outs["pos_ref"] - outs["state"][:, 0:3]
            return jnp.sqrt(jnp.mean(jnp.sum(e**2, -1)))

        return run

    record("ekf_mpc_fused_multitick", make_noisy)

    # same loop with the opt-in per-DISPATCH Jacobian cadence
    # (EKFConfig.relinearize_every="dispatch"): drops the 4 in-kernel
    # Jacobian builds + 3 (128,128) HIGHEST matmuls per tick for a small
    # bounded covariance drift (~4e-4 m / 240 ticks, tests/test_estimation)
    from unmanned_aerial_vehicles_tpu.estimation import EKFConfig

    def make_noisy_dispatch(T):
        @jax.jit
        def run(x_jitter):
            x0 = (jnp.zeros(12, jnp.float32)
                  .at[2].set(CFG.takeoff_height).at[0].set(x_jitter))
            outs = noisy_mpc_flight_rollout(
                mpc_f, ref, T, jax.random.PRNGKey(0),
                ekf_cfg=EKFConfig(relinearize_every="dispatch"),
                cfg=FlightLoopConfig(use_fused_tick=True,
                                     ticks_per_dispatch=20,
                                     fused_tick_loop_precision="default"),
                initial_state=x0,
            )
            e = outs["pos_ref"] - outs["state"][:, 0:3]
            return jnp.sqrt(jnp.mean(jnp.sum(e**2, -1)))

        return run

    record("ekf_mpc_fused_multitick_relin_dispatch", make_noisy_dispatch)

    # fastest EKF mode: dispatch cadence + bf16 covariance-propagation dots
    # (EKFConfig.cov_precision="bf16" — the 5 (128,128) Riccati-chain dots
    # run single-pass; drift bounded on chip in
    # tests_tpu::test_noisy_multitick_bf16_cov_on_chip)
    def make_noisy_bf16(T):
        @jax.jit
        def run(x_jitter):
            x0 = (jnp.zeros(12, jnp.float32)
                  .at[2].set(CFG.takeoff_height).at[0].set(x_jitter))
            outs = noisy_mpc_flight_rollout(
                mpc_f, ref, T, jax.random.PRNGKey(0),
                ekf_cfg=EKFConfig(relinearize_every="dispatch",
                                  cov_precision="bf16"),
                cfg=FlightLoopConfig(use_fused_tick=True,
                                     ticks_per_dispatch=20,
                                     fused_tick_loop_precision="default"),
                initial_state=x0,
            )
            e = outs["pos_ref"] - outs["state"][:, 0:3]
            return jnp.sqrt(jnp.mean(jnp.sum(e**2, -1)))

        return run

    record("ekf_mpc_fused_multitick_bf16_cov", make_noisy_bf16)

    # disturbance-observer tier (estimation/disturbance.py): the 15-state
    # augmented filter + MPC feedforward on the STAGED path — the
    # learning-free wind-rejection capability's reference-semantics row
    def make_dob(T):
        @jax.jit
        def run(x_jitter):
            x0 = (jnp.zeros(12, jnp.float32)
                  .at[2].set(CFG.takeoff_height).at[0].set(x_jitter))
            outs = noisy_mpc_flight_rollout(
                mpc_f, ref, T, jax.random.PRNGKey(0),
                cfg=FlightLoopConfig(use_fused_tick=False),
                initial_state=x0, disturbance_observer=True,
            )
            e = outs["pos_ref"] - outs["state"][:, 0:3]
            return jnp.sqrt(jnp.mean(jnp.sum(e**2, -1)))

        return run

    record("disturbance_observer_staged", make_dob)

    # the SAME observer at the latency tier: 15-state augmented filter
    # INSIDE the multi-tick kernel (round-5: the augmented Riccati recursion
    # rides the padded covariance operand; the estimate feeds the in-kernel
    # residual lanes) — parity pinned in
    # tests_tpu::test_disturbance_observer_fused_on_chip
    def make_dob_fused(T):
        @jax.jit
        def run(x_jitter):
            x0 = (jnp.zeros(12, jnp.float32)
                  .at[2].set(CFG.takeoff_height).at[0].set(x_jitter))
            outs = noisy_mpc_flight_rollout(
                mpc_f, ref, T, jax.random.PRNGKey(0),
                cfg=FlightLoopConfig(use_fused_tick=True,
                                     ticks_per_dispatch=20,
                                     fused_tick_loop_precision="default"),
                initial_state=x0, disturbance_observer=True,
            )
            e = outs["pos_ref"] - outs["state"][:, 0:3]
            return jnp.sqrt(jnp.mean(jnp.sum(e**2, -1)))

        return run

    record("disturbance_observer_fused_multitick", make_dob_fused)

    # gusts at the latency tier: time-varying wind through the multi-tick
    # kernel's per-tick (k_ticks, 16) plant-row operand + the in-kernel
    # observer — the per-tick row indexing must cost ~nothing vs the
    # constant-row observer tier above (parity pinned in
    # tests_tpu::test_gust_fused_multitick_on_chip)
    from unmanned_aerial_vehicles_tpu.models import RigidBodyParams

    windy_body = RigidBodyParams(wind=(1.5, 0.8, 0.0))
    w_pre = jnp.asarray([1.5, 0.8, 0.0], jnp.float32)
    w_post = jnp.asarray([-1.0, 1.5, 0.0], jnp.float32)

    def make_gust_fused(T):
        @jax.jit
        def run(x_jitter):
            x0 = (jnp.zeros(12, jnp.float32)
                  .at[2].set(CFG.takeoff_height).at[0].set(x_jitter))
            outs = noisy_mpc_flight_rollout(
                mpc_f, ref, T, jax.random.PRNGKey(0), body=windy_body,
                cfg=FlightLoopConfig(use_fused_tick=True,
                                     ticks_per_dispatch=20,
                                     fused_tick_loop_precision="default"),
                initial_state=x0, disturbance_observer=True,
                wind_fn=lambda t: jnp.where(
                    t < 0.5 * T * CFG.control_dt, w_pre, w_post
                ),
            )
            e = outs["pos_ref"] - outs["state"][:, 0:3]
            return jnp.sqrt(jnp.mean(jnp.sum(e**2, -1)))

        return run

    record("gust_observer_fused_multitick", make_gust_fused)

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "artifacts",
        "controller_latency.json",
    )
    if only is not None and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)["results"]
        prior.update(results)
        results = prior
    with open(out_path, "w") as f:
        json.dump(
            {
                "note": (
                    "closed-loop tick latency per controller on TPU v5e-1, "
                    "slope-measured (fixed tunnel dispatch cancelled); "
                    "vs the reference's implied <20 ms real-time budget "
                    "(src/px4/mpc.py:1868). 12-state rows fly the z-up "
                    "rigid body (X500), pid/mpc the PX4 surrogate."
                ),
                "results": results,
            },
            f, indent=2,
        )
    print("wrote", out_path)


if __name__ == "__main__":
    main()
