"""Kernel-level numerics on the REAL chip (Mosaic-compiled, not interpreted).

Every assertion here has a CPU interpreter-mode twin in ``tests/``; these
runs catch what only the hardware shows: Mosaic lowering/relayout rules,
MXU precision behaviour (bf16 passes vs HIGHEST), and the axon-tunnel
execution path. Shapes are kept small — the first run compiles (~minutes
over the tunnel, cached thereafter), warm reruns take seconds.
"""

import jax
import jax.numpy as jnp
import numpy as np

from unmanned_aerial_vehicles_tpu.control.mpc_linear import LinearMPC, LinearMPCConfig
from unmanned_aerial_vehicles_tpu.gp import build_horizon_residuals
from unmanned_aerial_vehicles_tpu.gp.residual_gp import (
    ResidualDataset,
    ResidualGPConfig,
    fit_residual_gp_masked,
    masked_input_stats,
    standardized_params,
)
from unmanned_aerial_vehicles_tpu.loop import (
    FlightLoopConfig,
    OnlineFusedGPConfig,
    mpc_flight_rollout,
)
from unmanned_aerial_vehicles_tpu.models import RigidBodyParams
from unmanned_aerial_vehicles_tpu.models.params import RigidBodyParams as Body
from unmanned_aerial_vehicles_tpu.models.px4_surrogate import (
    RateLoopParams,
    px4_rate_tracking_step,
)

_f32 = jnp.float32


def circle_ref(t):
    pos = jnp.stack(
        [0.5 * jnp.sin(0.3 * t), 0.5 * jnp.cos(0.3 * t), 3.0 + 0.0 * t]
    )
    return pos, _f32(0.0)


def fused_mpc(**kw):
    kw.setdefault("horizon", 10)
    kw.setdefault("admm_iterations", 40)
    return LinearMPC(LinearMPCConfig(use_fused_controller=True, **kw),
                     dtype=_f32)


def _pos_gap(a, b):
    return float(np.max(np.abs(
        np.asarray(a["state"][:, 0:3]) - np.asarray(b["state"][:, 0:3])
    )))


# ---------------------------------------------------------------------------
# plant kernel: Mosaic RK4 vs the staged XLA step
# ---------------------------------------------------------------------------


def test_plant_kernel_matches_staged_on_chip():
    from unmanned_aerial_vehicles_tpu.ops.plant_pallas import (
        px4_plant_step_fused,
    )

    body, rl = Body(), RateLoopParams()
    state = jnp.asarray(
        [0.3, -0.2, 3.0, 0.4, 0.1, -0.3, 0.05, -0.02, 0.3, 0.1, 0.0, -0.1],
        _f32,
    )
    control = jnp.asarray([0.8, 0.1, -0.2, 0.05], _f32)

    @jax.jit
    def both(s, c):
        fused = px4_plant_step_fused(
            s, c, body.mass, body.gravity, body.k_drag_linear,
            (rl.tau_roll, rl.tau_pitch, rl.tau_yaw), 0.02, substeps=2,
            thrust_gain=body.gravity / rl.hover_thrust_norm,
        )
        staged = s
        for _ in range(2):
            staged = px4_rate_tracking_step(staged, c, body, rl, 0.01)
        return fused, staged

    fused, staged = both(state, control)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(staged), atol=1e-6
    )


# ---------------------------------------------------------------------------
# multi-tick GP-MPC kernel vs the staged path, on-chip, HIGHEST precision
# ---------------------------------------------------------------------------


def test_multitick_kernel_matches_staged_on_chip():
    mpc = fused_mpc()
    T = 80
    staged = jax.jit(
        lambda: mpc_flight_rollout(
            mpc, circle_ref, T,
            cfg=FlightLoopConfig(use_fused_tick=True,
                                 fused_tick_loop_precision="highest"),
        )
    )()
    multi = jax.jit(
        lambda: mpc_flight_rollout(
            mpc, circle_ref, T,
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8,
                                 fused_tick_loop_precision="highest"),
        )
    )()
    assert _pos_gap(staged, multi) < 2e-4


def test_fused_tick_ad_forward_identity_on_chip():
    """The custom_vjp wrapper's forward IS the kernel: bit-equal on TPU."""
    mpc = fused_mpc()
    cfg = FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8)
    raw = jax.jit(
        lambda: mpc_flight_rollout(mpc, circle_ref, 40, cfg=cfg)
    )()
    ad = jax.jit(
        lambda: mpc_flight_rollout(
            mpc, circle_ref, 40, cfg=cfg.replace(fused_tick_ad=True)
        )
    )()
    np.testing.assert_array_equal(
        np.asarray(raw["state"]), np.asarray(ad["state"])
    )


# ---------------------------------------------------------------------------
# in-kernel GP posterior (incl. the centered/ARD scaled mode) vs XLA predict
# ---------------------------------------------------------------------------


def _ard_posterior():
    rng = np.random.default_rng(3)
    scales = np.r_[6.0, 6.0, 3.0, 1.5, 1.5, 0.8, 1.0, 0.5, 0.5, 0.3]
    offsets = np.r_[0.0, 0.0, 3.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    X = np.asarray(rng.normal(size=(64, 10)) * scales + offsets, np.float32)
    Y = np.asarray(0.05 * rng.normal(size=(64, 6)), np.float32)
    ds = ResidualDataset(
        X=jnp.asarray(X), Y=jnp.asarray(Y),
        head=jnp.asarray(64, jnp.int32), count=jnp.asarray(64, jnp.int32),
    )
    gcfg = ResidualGPConfig(residual_gain=1.0)
    post = jax.jit(
        lambda d: fit_residual_gp_masked(
            d, gcfg, params=standardized_params(d, gcfg),
            x_shift=masked_input_stats(d)[0],
        )
    )(ds)
    return post, gcfg


def test_scaled_ard_gp_through_kernel_on_chip():
    """The centered standardized (ARD) posterior must fly the multi-tick
    kernel on the REAL chip without the f32 distance blow-up that motivated
    GPPosterior.x_shift, matching the staged residual_fn path."""
    post, gcfg = _ard_posterior()
    assert np.isfinite(np.asarray(post.chol)).all()   # centered fit is sane
    mpc = fused_mpc()
    T = 40
    rf = lambda Xg, Ug: build_horizon_residuals(post, Xg, Ug, gcfg)
    staged = jax.jit(
        lambda: mpc_flight_rollout(
            mpc, circle_ref, T, cfg=FlightLoopConfig(use_fused_tick=True),
            residual_fn=rf,
        )
    )()
    fused = jax.jit(
        lambda: mpc_flight_rollout(
            mpc, circle_ref, T,
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8,
                                 fused_tick_loop_precision="highest"),
            gp_posterior=post, gp_gain=gcfg.residual_gain,
        )
    )()
    assert _pos_gap(staged, fused) < 5e-4


# ---------------------------------------------------------------------------
# online learning + EKF tiers: health on the hardware execution path
# ---------------------------------------------------------------------------


def test_online_fused_learns_on_chip():
    windy = RigidBodyParams(wind=(1.0, 0.5, 0.0))
    mpc = fused_mpc()
    ogp = OnlineFusedGPConfig(
        gp=ResidualGPConfig(max_data_points=64, residual_gain=1.0),
        refit_every=64, min_samples=16,
    )
    outs = jax.jit(
        lambda: mpc_flight_rollout(
            mpc, circle_ref, 256, body=windy,
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8),
            online_gp=ogp, gp_gain=1.0,
        )
    )()
    assert np.isfinite(np.asarray(outs["state"])).all()
    assert int(outs["gp_count"][-1]) > 16


def test_noisy_multitick_kernel_on_chip():
    """EKF inside the multi-tick kernel (per-tick analytic Jacobian):
    matches the staged per-tick-jacfwd EKF loop on the same PRNG stream."""
    from unmanned_aerial_vehicles_tpu.estimation import (
        noisy_mpc_flight_rollout,
    )

    mpc = fused_mpc()
    key = jax.random.PRNGKey(0)
    staged = jax.jit(
        lambda: noisy_mpc_flight_rollout(mpc, circle_ref, 64, key)
    )()
    fused = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc, circle_ref, 64, key,
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8),
        )
    )()
    assert _pos_gap(staged, fused) < 1e-3


def test_noisy_multitick_bf16_cov_on_chip():
    """EKFConfig.cov_precision='bf16': the covariance-propagation dots run
    single-pass bf16 on the REAL MXU (CPU interpret executes them in f32,
    so only this test sees the actual rounding). The drift vs the staged
    f32 filter must stay bounded and the covariance finite + symmetric-ish
    over whole dispatches."""
    from unmanned_aerial_vehicles_tpu.estimation import (
        EKFConfig,
        noisy_mpc_flight_rollout,
    )

    mpc = fused_mpc()
    key = jax.random.PRNGKey(0)
    staged = jax.jit(
        lambda: noisy_mpc_flight_rollout(mpc, circle_ref, 240, key)
    )()
    bf16 = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc, circle_ref, 240, key,
            ekf_cfg=EKFConfig(cov_precision="bf16"),
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8),
        )
    )()
    gap = _pos_gap(staged, bf16)
    assert gap < 2e-2, gap
    P = np.asarray(bf16["final_covariance"])
    assert np.isfinite(P).all()
    np.testing.assert_allclose(P, P.T, atol=1e-3)
    est_err = np.linalg.norm(
        np.asarray(bf16["state_est"][:, 0:3] - bf16["state"][:, 0:3]), axis=1
    )
    assert est_err[80:].mean() < 0.05


def test_batched_controller_kernel_on_chip():
    from unmanned_aerial_vehicles_tpu.loop.closed_loop import (
        batched_mpc_flight_sweep,
    )

    mpc = fused_mpc()
    starts = jnp.zeros((8, 12), _f32).at[:, 2].set(3.0)
    starts = starts.at[:, 0].set(jnp.linspace(-0.3, 0.3, 8, dtype=_f32))
    batched = jax.jit(
        lambda: batched_mpc_flight_sweep(mpc, circle_ref, 64, starts)
    )()
    single = jax.jit(
        lambda: mpc_flight_rollout(
            mpc, circle_ref, 64,
            cfg=FlightLoopConfig(use_fused_tick=True),
            initial_state=starts[0],
        )
    )()
    # batched flight 0 == the single flight from the same start
    # (sweep outputs are (T, B, ...))
    gap = float(np.max(np.abs(
        np.asarray(batched["state"][:, 0, 0:3])
        - np.asarray(single["state"][:, 0:3])
    )))
    assert gap < 5e-4, gap


# ---------------------------------------------------------------------------
# fused GP posterior-mean kernel: limb-compensated dist-in-GEMM on the MXU
# ---------------------------------------------------------------------------
def test_posterior_mean_kernel_on_chip():
    """The bf16-limb tiers on REAL Mosaic: "highest" must beat the staged
    f32 path against an f64 ground truth (the per-dim in-accumulator
    cancellation avoids f32's sq1+sq2-2cross catastrophic cancellation);
    "high" must be within the staged path's own f64 error class. Also guards
    the XLA-side limb splits against convert-elision under jit (the
    optimization_barrier in _split_limbs is load-bearing — without it
    XLA:TPU folds f32->bf16->f32 round-trips to identity inside fusions and
    every compensation limb silently becomes zero)."""
    from unmanned_aerial_vehicles_tpu.gp import fit_residual_gp
    from unmanned_aerial_vehicles_tpu.gp.exact_gp import predict_mean
    from unmanned_aerial_vehicles_tpu.ops.rbf_pallas import (
        rbf_posterior_mean_pallas,
    )

    rng = np.random.default_rng(5)
    # real-flight-like magnitudes: the failure mode needs |z|^2 ~ hundreds
    X = jnp.asarray(
        rng.normal(size=(300, 10)) * np.array([6, 6, 0.3, 1, 1, 0.3,
                                               1, 1, 0.5, 0.1])
        + np.array([0, 0, 3.4, 0, 0, 0, 0, 0, -2, 0]),
        _f32,
    )
    Y = jnp.asarray(0.05 * rng.normal(size=(300, 6)), _f32)
    post = fit_residual_gp(X, Y, ResidualGPConfig())
    Xt = X[:128] + 0.01

    Z = np.asarray(X, np.float64) / 0.5
    Zt = np.asarray(Xt, np.float64) / 0.5
    d2 = ((Zt[:, None, :] - Z[None, :, :]) ** 2).sum(-1)
    tru = (
        np.exp(-0.5 * d2) @ np.asarray(post.alpha, np.float64)
        * np.asarray(post.y_std, np.float64)
        + np.asarray(post.y_mean, np.float64)
    )
    staged_err = np.abs(
        np.asarray(jax.jit(predict_mean)(post, Xt), np.float64) - tru
    ).max()

    errs = {}
    for prec in ("highest", "high", "default"):
        got = rbf_posterior_mean_pallas(post, Xt, precision=prec)
        errs[prec] = np.abs(np.asarray(got, np.float64) - tru).max()
    assert errs["highest"] <= max(staged_err, 1e-6), (errs, staged_err)
    assert errs["high"] <= 10 * max(staged_err, 1e-6), (errs, staged_err)
    # elision guard: the convert-elision bug collapsed every tier to plain
    # bf16 (all errs equal); the tiers must actually separate
    assert errs["highest"] < errs["default"] / 100, (errs, staged_err)


def test_batched_sweep_fused_gp_on_chip():
    """gp_posterior routing (fused Pallas GP) vs staged residual_fn on the
    REAL batched sweep: bounded RMS shift."""
    from unmanned_aerial_vehicles_tpu.gp import fit_residual_gp
    from unmanned_aerial_vehicles_tpu.loop.closed_loop import (
        batched_mpc_flight_sweep,
    )

    rng = np.random.default_rng(2)
    gp_cfg = ResidualGPConfig()
    X = jnp.asarray(rng.normal(size=(200, 10)), _f32)
    Y = jnp.asarray(0.05 * rng.normal(size=(200, 6)), _f32)
    post = fit_residual_gp(X, Y, gp_cfg)
    mpc = fused_mpc()
    starts = jnp.zeros((4, 12), _f32).at[:, 2].set(3.0)
    rf = lambda Xg, Ug: build_horizon_residuals(post, Xg, Ug, gp_cfg)
    o_staged = batched_mpc_flight_sweep(
        mpc, circle_ref, 50, starts, cfg=FlightLoopConfig(), residual_fn=rf
    )
    o_fused = batched_mpc_flight_sweep(
        mpc, circle_ref, 50, starts, cfg=FlightLoopConfig(),
        gp_posterior=post, gp_cfg=gp_cfg, gp_fused_precision="high",
    )
    gap = float(np.max(np.abs(
        np.asarray(o_fused["state"][:, :, 0:3])
        - np.asarray(o_staged["state"][:, :, 0:3])
    )))
    assert gap < 1e-3, gap


def test_rigid_plant_kernel_on_chip():
    """Mosaic-compiled rigid-body RK4 kernel vs the XLA step (round 5):
    single step 2e-8-grade, 20-step sequential roll 1e-6-grade."""
    from unmanned_aerial_vehicles_tpu.models import (
        GZ_QUADROTOR_PARAMS,
        rigid_body_rk4_step,
    )
    from unmanned_aerial_vehicles_tpu.ops.rigid_plant_pallas import (
        rigid_body_rollout_fused,
    )

    u0 = jnp.asarray([4.9, 0.01, -0.01, 0.02], jnp.float32)
    x0 = jnp.zeros(12, jnp.float32).at[2].set(1.0).at[6].set(0.1)
    U = jnp.tile(u0[None, :], (20, 1))

    got = np.asarray(jax.jit(lambda x: rigid_body_rollout_fused(
        x, U, GZ_QUADROTOR_PARAMS, 0.1, interpret=False))(x0))

    def scan_roll(x):
        def body(c, u):
            xn = rigid_body_rk4_step(c, u, GZ_QUADROTOR_PARAMS, 0.1)
            return xn, xn
        return jax.lax.scan(body, x, U)[1]

    want = np.asarray(jax.jit(scan_roll)(x0))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_obstacle_multitick_flight_on_chip():
    """Obstacle-constrained LTV multitick (K=2, kernel plan-roll, fused
    plant, attitude fallback) on the chip: finite, clears the sphere,
    tracks — the shipped bench-row configuration in miniature."""
    from unmanned_aerial_vehicles_tpu.control.mpc_rigid import LTVTrackingMPC
    from unmanned_aerial_vehicles_tpu.loop.rigid_loop import (
        make_attitude_recovery_fallback,
        sqp_multitick_rollout,
    )
    from unmanned_aerial_vehicles_tpu.models import GZ_QUADROTOR_PARAMS
    from unmanned_aerial_vehicles_tpu.ops.rigid_plant_pallas import (
        rigid_body_rk4_step_fast,
        rigid_body_rollout_fused,
    )

    DT, T = 0.1, 240
    obstacle = jnp.asarray([[0.0, 1.5, 1.0, 0.3]], jnp.float32)
    mpc = LTVTrackingMPC(num_obstacles=1, obstacle_margin=0.2)
    N = mpc.mpc.config.horizon

    def ref12(t):
        w = 2.0 * jnp.pi / 20.0
        r = jnp.zeros(12, jnp.float32)
        r = r.at[0].set(1.5 * jnp.cos(w * t)).at[1].set(1.5 * jnp.sin(w * t))
        r = r.at[2].set(1.0)
        return r.at[3].set(-1.5 * w * jnp.sin(w * t)).at[4].set(
            1.5 * w * jnp.cos(w * t))

    def reference_fn(ticks):
        def one(i):
            ts = (i + 1 + jnp.arange(N)).astype(jnp.float32) * DT
            return jax.vmap(ref12)(ts)
        return jax.vmap(one)(ticks)

    outs = jax.jit(lambda x: sqp_multitick_rollout(
        mpc.mpc, mpc.cost, reference_fn,
        lambda xx, u: rigid_body_rk4_step_fast(
            xx, u, GZ_QUADROTOR_PARAMS, DT, substeps=2),
        x, T, ticks_per_dispatch=2, admm_iterations=100,
        u_init=mpc.u_hover, obstacles=obstacle,
        plan_roll_fn=lambda xf, Uf, res: rigid_body_rollout_fused(
            xf, Uf, GZ_QUADROTOR_PARAMS, DT),
        fallback_fn=make_attitude_recovery_fallback(GZ_QUADROTOR_PARAMS),
    ))(ref12(0.0))
    st = np.asarray(outs["state"])
    assert np.isfinite(st).all()
    d = np.linalg.norm(st[:, 0:3] - np.asarray(obstacle[0, 0:3]), axis=1)
    assert d.min() > 0.3, d.min()          # clears the sphere
    ts = np.arange(T) * DT
    refs = np.stack([np.asarray(ref12(t)) for t in ts])
    rms = float(np.sqrt(np.mean(
        np.sum((st[:, 0:3] - refs[:, 0:3]) ** 2, -1))))
    assert rms < 0.5, rms


def test_ilqr_kernel_rollout_parity_on_chip():
    """The rk4 iLQR engine's kernel-backed forward rollouts (round 5) give
    the same solve as the pure-XLA scan of its step_fn — the substitution
    that takes the staged tick 947 -> ~354 us and the K=2 policy tier to
    ~76 us/tick (artifacts/controller_latency.json ilqr12_*rk4* rows)."""
    from unmanned_aerial_vehicles_tpu.control import ILQRRigidBodyMPC
    from unmanned_aerial_vehicles_tpu.control.ilqr import ilqr_solve

    eng = ILQRRigidBodyMPC(integrator="rk4")
    assert eng.rollout_fn is not None
    x = jnp.zeros(12, jnp.float32).at[2].set(1.0).at[0].set(0.8)
    tgt = jnp.concatenate([jnp.asarray([0.0, 0.5, 1.5], jnp.float32),
                           jnp.zeros(9, jnp.float32)])
    x_ref = jnp.tile(tgt[None], (eng.N + 1, 1))
    u_ref = jnp.tile(eng.u_hover[None], (eng.N, 1))

    def solve(roll):
        return jax.jit(lambda xx: ilqr_solve(
            eng.step_fn, xx, u_ref, eng.q_diag, eng.r_diag, x_ref, u_ref,
            iterations=3, reg=eng.reg, u_lower=eng.u_lower,
            u_upper=eng.u_upper, rollout_fn=roll))(x)

    sk = solve(eng.rollout_fn)   # Mosaic kernel rollouts
    sx = solve(None)             # lax.scan of step_fn
    np.testing.assert_allclose(np.asarray(sk.U), np.asarray(sx.U),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sk.X), np.asarray(sx.X),
                               rtol=2e-4, atol=2e-4)


def test_rigid_fused_multitick_on_chip():
    """The whole-tick-in-kernel tier for the TORQUE-SQP family
    (``rigid_multitick_fused`` — direct-rate kernel with the in-kernel
    plant swapped for rigid-body RK4 via the shared ``make_plant_math``)
    Mosaic-compiled matches the staged ``sqp_multitick_rollout`` flown on
    ``rigid_body_rk4_step``: per-tick u/state to f32 accumulation noise."""
    from unmanned_aerial_vehicles_tpu.control.mpc_rigid import RigidBodyMPC
    from unmanned_aerial_vehicles_tpu.loop.rigid_loop import (
        rigid_multitick_fused,
        sqp_multitick_rollout,
    )
    from unmanned_aerial_vehicles_tpu.models import (
        X500_PARAMS,
        rigid_body_rk4_step,
    )

    DT = 0.02
    eng = RigidBodyMPC()
    N = eng.mpc.config.horizon

    def reference_fn(ticks):
        ts = ticks.astype(jnp.float32) * DT
        pos = jnp.stack([0.5 * jnp.sin(0.3 * ts), 0.5 * jnp.cos(0.3 * ts),
                         3.0 + 0.0 * ts], axis=1)
        stage = jnp.concatenate([pos, jnp.zeros((ts.shape[0], 9))], axis=1)
        return jnp.tile(stage[:, None, :], (1, N, 1))

    plant = lambda x, u: rigid_body_rk4_step(x, u, X500_PARAMS, DT)
    x0 = jnp.zeros(12, jnp.float32).at[2].set(3.0)
    T, K = 24, 4

    staged = jax.jit(lambda x: sqp_multitick_rollout(
        eng.mpc, eng.cost, reference_fn, plant, x, T,
        ticks_per_dispatch=K, admm_iterations=30, u_init=eng.u_hover,
    ))(x0)
    fused = jax.jit(lambda x: rigid_multitick_fused(
        eng.mpc, eng.cost, reference_fn, x, T,
        ticks_per_dispatch=K, admm_iterations=30, u_init=eng.u_hover,
        dt=DT,
    ))(x0)
    du = float(np.max(np.abs(np.asarray(staged["u"]) -
                             np.asarray(fused["u"]))))
    dx = float(np.max(np.abs(np.asarray(staged["state"]) -
                             np.asarray(fused["state"]))))
    assert np.isfinite(np.asarray(fused["state"])).all()
    assert du < 2e-3, du
    assert dx < 2e-3, dx


def test_mppi_fused_sampling_kernel_on_chip():
    """The Mosaic-compiled MPPI sampling kernel (all K rollouts + stage
    costs in one dispatch, ops.mppi_pallas) matches the vmapped-XLA
    rollout costs and produces the same control update — the substitution
    that takes the MPPI tick 153 -> ~36 us/tick
    (artifacts/controller_latency.json mppi12_* rows)."""
    from unmanned_aerial_vehicles_tpu.control import MPPIConfig, MPPIController
    from unmanned_aerial_vehicles_tpu.ops.mppi_pallas import (
        mppi_rollout_costs_fused,
    )

    cfg = MPPIConfig(horizon=10, num_samples=128)
    ctrl = MPPIController(cfg)
    rng = np.random.default_rng(11)
    x0 = jnp.asarray(
        np.concatenate([[0.4, -0.2, 3.0], rng.normal(0, 0.3, 3),
                        rng.normal(0, 0.15, 3), rng.normal(0, 0.1, 3)]),
        jnp.float32)
    U = jnp.clip(
        ctrl.u_hover[None, None, :]
        + jnp.asarray(rng.normal(0, 1.0, (128, 10, 4)) *
                      np.array([3.0, 0.05, 0.05, 0.02]), jnp.float32),
        ctrl.u_lo, ctrl.u_hi)
    targets = jnp.asarray(rng.normal(0, 0.5, (10, 3)) + [0, 0, 3.0],
                          jnp.float32)
    yaw = jnp.float32(0.3)
    weights = (cfg.q_pos, cfg.q_vel, cfg.q_att, cfg.q_yaw, cfg.q_rate,
               *cfg.r_control, cfg.terminal_weight)

    got = np.asarray(jax.jit(lambda xx, UU: mppi_rollout_costs_fused(
        xx, UU, targets, yaw, ctrl.params, cfg.dt, ctrl.u_hover, weights,
        interpret=False))(x0, U))
    want = np.asarray(jax.jit(jax.vmap(
        lambda Us: ctrl._rollout_cost(x0, Us, targets, yaw)))(U))
    # costs are O(1e3-1e5) sums of ~40 squared terms; f32 + Mosaic
    # transcendental rounding
    np.testing.assert_allclose(got, want, rtol=5e-4)

    # end-to-end: the fused and vmapped solves pick the same control
    mc = ctrl.init_carry(x0)
    u_f, _, _ = jax.jit(ctrl.solve)(mc, x0, targets[0], yaw)
    ctrl_v = MPPIController(MPPIConfig(horizon=10, num_samples=128,
                                       fused_rollouts=False))
    u_v, _, _ = jax.jit(ctrl_v.solve)(mc, x0, targets[0], yaw)
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_v),
                               rtol=1e-3, atol=1e-3)


def test_disturbance_observer_on_chip():
    """The 15-state augmented-EKF observer (estimation/disturbance.py) on
    the real chip: staged XLA, but the (15,15) Riccati algebra runs on the
    MXU's f32 passes — pin that the windy-flight estimate converges to the
    wind's accel gap and the feedforward improves tracking, the same
    invariants the campaign's dob rows gate at full length."""
    from unmanned_aerial_vehicles_tpu.control.mpc_linear import (
        LinearMPC,
        LinearMPCConfig,
    )
    from unmanned_aerial_vehicles_tpu.estimation import (
        noisy_mpc_flight_rollout,
    )
    from unmanned_aerial_vehicles_tpu.models import RigidBodyParams
    from unmanned_aerial_vehicles_tpu.trajectories import (
        ramped_figure8_reference,
    )

    windy = RigidBodyParams(wind=(1.5, 0.8, 0.0))
    mpc = LinearMPC(LinearMPCConfig())

    def ref(t):
        pos, yaw = ramped_figure8_reference(t)
        return pos + jnp.asarray([0.0, 0.0, 3.0], jnp.float32), yaw

    def fly(dob):
        return jax.jit(
            lambda: noisy_mpc_flight_rollout(
                mpc, ref, 800, jax.random.PRNGKey(0), body=windy,
                preview=True, disturbance_observer=dob,
            )
        )()

    plain, dob = fly(None), fly(True)

    def rms(outs):
        e = np.linalg.norm(
            np.asarray(outs["pos_ref"] - outs["state"][:, 0:3]), axis=1)
        return float(np.sqrt((e[400:] ** 2).mean()))

    assert rms(dob) < 0.75 * rms(plain), (rms(dob), rms(plain))
    d = np.asarray(dob["disturbance_est"])[400:].mean(axis=0)
    # settled estimate points INTO the wind (both horizontal components)
    assert d[0] > 0.5 and d[1] > 0.2 and abs(d[2]) < 0.3, d


def test_disturbance_observer_fused_on_chip():
    """The SAME augmented observer INSIDE the multi-tick kernel (the
    latency tier): the 15-state Riccati recursion rides the padded
    (128,128) covariance operand through the real Mosaic compiler and the
    kernel's residual-feedforward lanes carry the estimate. Must glue to
    the staged ``dekf_step`` flight on the same PRNG stream."""
    from unmanned_aerial_vehicles_tpu.estimation import (
        noisy_mpc_flight_rollout,
    )
    from unmanned_aerial_vehicles_tpu.models import RigidBodyParams

    windy = RigidBodyParams(wind=(1.5, 0.8, 0.0))
    mpc = fused_mpc()
    key = jax.random.PRNGKey(0)
    staged = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc, circle_ref, 240, key, body=windy,
            disturbance_observer=True,
        )
    )()
    fused = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc, circle_ref, 240, key, body=windy,
            disturbance_observer=True,
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8),
        )
    )()
    assert _pos_gap(staged, fused) < 1e-3
    d_gap = np.abs(
        np.asarray(staged["disturbance_est"])
        - np.asarray(fused["disturbance_est"])
    ).max()
    assert d_gap < 1e-3, d_gap
    P = np.asarray(fused["final_covariance"])
    assert P.shape == (15, 15)
    assert np.isfinite(P).all()
    np.testing.assert_allclose(P, P.T, atol=1e-4)


def test_gust_fused_multitick_on_chip():
    """Gusts at the latency tier: the (k_ticks, 16) PER-TICK plant-row
    operand (time-varying wind) through the real Mosaic compiler — the
    dynamic sublane slice ``plant_ref[pl.ds(t, 1), :]`` is the new lowering
    surface. Observer + gust must glue to the staged wind_fn flight."""
    from unmanned_aerial_vehicles_tpu.estimation import (
        noisy_mpc_flight_rollout,
    )
    from unmanned_aerial_vehicles_tpu.models import RigidBodyParams

    windy = RigidBodyParams(wind=(1.5, 0.8, 0.0))
    w0 = jnp.asarray([1.5, 0.8, 0.0], _f32)
    w1 = jnp.asarray([-1.0, 1.5, 0.0], _f32)

    def wind_fn(t):
        return jnp.where(t < 2.0, w0, w1)

    mpc = fused_mpc()
    key = jax.random.PRNGKey(0)
    staged = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc, circle_ref, 240, key, body=windy,
            disturbance_observer=True, wind_fn=wind_fn,
        )
    )()
    fused = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc, circle_ref, 240, key, body=windy,
            disturbance_observer=True, wind_fn=wind_fn,
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8),
        )
    )()
    assert _pos_gap(staged, fused) < 1e-3
    d_gap = np.abs(
        np.asarray(staged["disturbance_est"])
        - np.asarray(fused["disturbance_est"])
    ).max()
    assert d_gap < 2e-3, d_gap
    # the estimate flips with the gust on the chip too
    d = np.asarray(fused["disturbance_est"])
    assert d[60:100, 0].mean() > 0.0 > d[200:, 0].mean()
