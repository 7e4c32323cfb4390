"""Round-3 fused-tier capabilities: online in-flight GP learning on the
multi-tick kernel path, dispersed/windy plants on the fused kernels, and
in-kernel GP variance + constraint tightening.

These close the capability x execution-tier matrix of VERDICT round 2: the
flagship 5 us latency path previously flew a frozen, mean-only GP on a fixed
nominal plant; every test here exercises the upgraded fast path against its
staged (XLA) twin or against the reference-mirroring staged behaviour.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unmanned_aerial_vehicles_tpu.control.mpc_linear import LinearMPC, LinearMPCConfig
from unmanned_aerial_vehicles_tpu.gp import build_horizon_residuals, fit_residual_gp
from unmanned_aerial_vehicles_tpu.gp.residual_gp import (
    ResidualGPConfig,
    build_horizon_uncertainty,
)
from unmanned_aerial_vehicles_tpu.loop import (
    FlightLoopConfig,
    OnlineFusedGPConfig,
    mpc_flight_rollout,
)
from unmanned_aerial_vehicles_tpu.models import RigidBodyParams
from unmanned_aerial_vehicles_tpu.trajectories import ramped_figure8_reference


def fused_mpc(**kw):
    kw.setdefault("horizon", 10)
    kw.setdefault("admm_iterations", 40)
    return LinearMPC(LinearMPCConfig(use_fused_controller=True, **kw))


def circle_ref(t):
    pos = jnp.stack(
        [0.5 * jnp.sin(0.3 * t), 0.5 * jnp.cos(0.3 * t), 3.0 + 0.0 * t]
    )
    return pos, jnp.float32(0.0)


def rms(outs, tail=0):
    err = np.linalg.norm(
        np.asarray(outs["pos_ref"] - outs["state"][:, 0:3]), axis=1
    )
    return float(np.sqrt((err[tail:] ** 2).mean()))


# ---------------------------------------------------------------------------
# traced plant scalars: wind + dispersions on the fused kernels
# ---------------------------------------------------------------------------


def test_fused_windy_plant_matches_staged():
    """The fused tick kernel's plant section must reproduce the staged XLA
    plant under steady wind (airspeed drag, ``RigidBodyParams.wind``) —
    previously the kernels baked the zero-wind nominal plant as statics."""
    windy = RigidBodyParams(wind=(1.2, -0.7, 0.3))
    mpc = fused_mpc()
    T = 200
    staged = mpc_flight_rollout(mpc, circle_ref, T, body=windy)
    fused = mpc_flight_rollout(
        mpc, circle_ref, T, body=windy,
        cfg=FlightLoopConfig(use_fused_tick=True),
    )
    gap = np.max(
        np.abs(np.asarray(staged["state"]) - np.asarray(fused["state"]))
    )
    assert gap < 5e-4, gap
    # wind must actually matter (plant really consumed the wind lanes)
    calm = mpc_flight_rollout(
        mpc, circle_ref, T, cfg=FlightLoopConfig(use_fused_tick=True)
    )
    assert (
        np.max(np.abs(np.asarray(calm["state"]) - np.asarray(fused["state"])))
        > 1e-2
    )


def test_fused_dispersed_plants_vmap():
    """One compiled multi-tick kernel serves a whole dispersion batch:
    ``vmap`` over ``RigidBodyParams`` batches (mass/drag/wind) must equal
    the per-plant runs — the Monte-Carlo fast path."""
    mpc = fused_mpc()
    cfg = FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=4)
    T = 80
    masses = jnp.asarray([0.45, 0.5, 0.55, 0.6])
    winds = jnp.asarray(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, -1.0, 0.5], [0.5, 0.5, 0.0]]
    )
    bodies = jax.vmap(
        lambda m, w: RigidBodyParams().replace(mass=m, wind=(w[0], w[1], w[2]))
    )(masses, winds)

    def flight(body):
        return mpc_flight_rollout(mpc, circle_ref, T, body=body, cfg=cfg)[
            "state"
        ]

    batched = jax.vmap(flight)(bodies)
    for i in range(4):
        body_i = jax.tree_util.tree_map(lambda a: a[i], bodies)
        single = flight(body_i)
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), atol=1e-5
        )


# ---------------------------------------------------------------------------
# online in-flight GP learning at the fused tier
# ---------------------------------------------------------------------------


def test_online_fused_gp_learns_wind_disturbance():
    """VERDICT round-2 next-step #1 done criterion: the ONLINE ring-buffer
    GP runs on the fused multi-tick path (``ticks_per_dispatch=8``) and
    recovers a large share of the wind-induced tracking penalty — the
    configuration the headline latency number describes. Mirrors the staged
    ``test_online_gp_learns_wind_disturbance`` (no-wind 0.19 m -> windy
    plain 1.38 m -> windy online 0.85 m); the fused path must land within
    5% of the staged online RMS."""
    windy = RigidBodyParams(wind=(1.5, 0.8, 0.0))
    steps = 2000  # 40 s

    def ref(t):
        pos, yaw = ramped_figure8_reference(t, amplitude=6.0, frequency=0.02)
        return pos + jnp.array([0.0, 0.0, 3.0]), yaw

    mpc = LinearMPC(
        LinearMPCConfig(
            horizon=20, admm_iterations=60, use_fused_controller=True
        ),
        dtype=jnp.float32,
    )
    cfg = FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8)

    plain = jax.jit(
        lambda: mpc_flight_rollout(
            mpc, ref, steps, body=windy, cfg=cfg, preview=True
        )
    )()
    ogp = OnlineFusedGPConfig(
        gp=ResidualGPConfig(max_data_points=256, residual_gain=1.0),
        refit_every=200,
    )
    online = jax.jit(
        lambda: mpc_flight_rollout(
            mpc, ref, steps, body=windy, cfg=cfg, preview=True,
            online_gp=ogp, gp_gain=1.0,
        )
    )()

    r_plain = rms(plain, tail=1000)
    r_online = rms(online, tail=1000)
    assert int(online["gp_count"][-1]) > 100   # in-flight data collection
    # the GP must recover a substantial share of the wind penalty
    assert r_online < 0.75 * r_plain, (r_online, r_plain)
    # within 5% of the staged online path's measured 0.85 m on this setup
    assert r_online < 0.85 * 1.05, r_online


def test_online_fused_guards():
    mpc = fused_mpc()
    ogp = OnlineFusedGPConfig(gp=ResidualGPConfig(max_data_points=32))
    with pytest.raises(ValueError, match="use_fused_tick"):
        mpc_flight_rollout(
            mpc, circle_ref, 8, cfg=FlightLoopConfig(), online_gp=ogp
        )
    rng = np.random.default_rng(0)
    post = fit_residual_gp(
        jnp.asarray(rng.normal(size=(16, 10)), jnp.float32),
        jnp.asarray(0.01 * rng.normal(size=(16, 6)), jnp.float32),
    )
    with pytest.raises(ValueError, match="in-flight"):
        mpc_flight_rollout(
            mpc, circle_ref, 8,
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=4),
            online_gp=ogp, gp_posterior=post,
        )
    with pytest.raises(ValueError, match="refit_every"):
        mpc_flight_rollout(
            mpc, circle_ref, 8,
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8),
            online_gp=OnlineFusedGPConfig(
                gp=ResidualGPConfig(max_data_points=32), refit_every=4
            ),
        )


# ---------------------------------------------------------------------------
# in-kernel GP variance + zero-order constraint tightening
# ---------------------------------------------------------------------------


def test_multitick_tightening_matches_staged_in_binding_regime(rng):
    """The in-kernel variance (cached-K^{-1} quadratic) + back-off must
    reproduce the staged ``LinearMPC.solve(uncertainty=...)`` tightening
    (triangular-solve variance) in a regime where the tightened bounds BIND
    — parity bar 1e-3 (VERDICT round-2 next-step #3)."""
    X = jnp.asarray(rng.normal(size=(64, 10)) * 2.0, jnp.float32)
    Y = jnp.asarray(4.0 * rng.normal(size=(64, 6)), jnp.float32)
    gcfg = ResidualGPConfig()
    post = fit_residual_gp(X, Y, gcfg)

    def fast_ref(t):
        pos = jnp.stack(
            [2.0 * jnp.sin(t), 2.0 * jnp.cos(t), 3.0 + 0.0 * t]
        )
        return pos, jnp.float32(0.0)

    T = 80
    kw = dict(
        horizon=10, admm_iterations=40,
        state_lower=(-5.0, -5.0, 2.0, -2.5, -2.5, -1.0),
        state_upper=(5.0, 5.0, 4.0, 2.5, 2.5, 1.0),
    )
    flights = {}
    for kappa in (0.0, 3.0):
        mpc_f = LinearMPC(
            LinearMPCConfig(
                tightening_factor=kappa, use_fused_controller=True, **kw
            )
        )
        fused = mpc_flight_rollout(
            mpc_f, fast_ref, T,
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=4),
            gp_posterior=post, gp_gain=gcfg.residual_gain,
        )
        mpc_s = LinearMPC(LinearMPCConfig(tightening_factor=kappa, **kw))
        staged = mpc_flight_rollout(
            mpc_s, fast_ref, T, cfg=FlightLoopConfig(),
            residual_fn=lambda Xg, Ug: build_horizon_residuals(
                post, Xg, Ug, gcfg
            ),
            uncertainty_fn=(
                (lambda Xg, Ug: build_horizon_uncertainty(post, Xg, Ug, gcfg))
                if kappa > 0 else None
            ),
        )
        gap = np.max(
            np.abs(
                np.asarray(staged["state"][:, 0:3])
                - np.asarray(fused["state"][:, 0:3])
            )
        )
        assert gap < 1e-3, (kappa, gap)
        flights[kappa] = np.asarray(fused["state"][:, 0:3])
    # the back-off must actually bind in this regime (capability is live,
    # not a no-op): kappa=3 visibly changes the flight
    assert np.max(np.abs(flights[3.0] - flights[0.0])) > 0.05


def test_tightening_requires_variance_rows():
    from unmanned_aerial_vehicles_tpu.ops.tick_pallas import build_gp_rows

    rng = np.random.default_rng(1)
    post = fit_residual_gp(
        jnp.asarray(rng.normal(size=(16, 10)), jnp.float32),
        jnp.asarray(0.01 * rng.normal(size=(16, 6)), jnp.float32),
    )
    rows = build_gp_rows(post, 0.1)
    assert rows.kinv is None and rows.y_std_row is None
    rows_v = build_gp_rows(post, 0.1, with_variance=True)
    assert rows_v.kinv.shape == (16, 16)
    # K^{-1} parity: kinv @ K == I on the training kernel
    from unmanned_aerial_vehicles_tpu.gp.kernels import rbf_kernel

    # rebuild the exact train kernel: RBF + (noise + alpha-jitter) I
    K = rbf_kernel(
        post.X_train, post.X_train,
        post.params.length_scale, post.params.signal_variance,
    ) + (post.params.noise_variance + ResidualGPConfig().alpha) * jnp.eye(16)
    resid = np.asarray(rows_v.kinv.astype(jnp.float64) @ K - jnp.eye(16))
    assert np.max(np.abs(resid)) < 1e-3


def test_batch_capture_matches_sequential(rng):
    """add_training_samples_batch == K sequential add_training_sample calls
    (same slots, same head/count, same filters), including wrap-around."""
    from unmanned_aerial_vehicles_tpu.gp.residual_gp import (
        add_training_sample,
        add_training_samples_batch,
        empty_dataset,
    )

    gcfg = ResidualGPConfig(max_data_points=16)
    K, T = 8, 6  # 48 inserts through a 16-slot ring: several wraps
    ds_seq = empty_dataset(16, jnp.float32)
    ds_bat = empty_dataset(16, jnp.float32)
    for t in range(T):
        states = rng.normal(size=(K, 6)) * 2.0      # some exceed vel filter
        controls = rng.normal(size=(K, 4)) * 1.5    # some exceed ctrl filter
        nxt = states + 0.02 * np.concatenate(
            [states[:, 3:6], controls[:, 0:3]], axis=1
        ) + 0.05 * rng.normal(size=(K, 6))          # some exceed residual
        states = jnp.asarray(states, jnp.float32)
        controls = jnp.asarray(controls, jnp.float32)
        nxt = jnp.asarray(nxt, jnp.float32)
        for i in range(K):
            ds_seq = add_training_sample(
                ds_seq, states[i], controls[i], nxt[i], gcfg
            )
        ds_bat = add_training_samples_batch(
            ds_bat, states, controls, nxt, gcfg
        )
    assert int(ds_seq.head) == int(ds_bat.head)
    assert int(ds_seq.count) == int(ds_bat.count)
    np.testing.assert_array_equal(np.asarray(ds_seq.X), np.asarray(ds_bat.X))
    np.testing.assert_array_equal(np.asarray(ds_seq.Y), np.asarray(ds_bat.Y))
    assert 0 < int(ds_bat.count) <= 16


def test_everything_on_fused_tier_stays_healthy():
    """The example-09 configuration: online learning + in-kernel variance
    tightening + divergence fallback + wind, all on the fused multi-tick
    path at once — the combinations must compose (each is individually
    pinned elsewhere; this guards their interaction)."""
    windy = RigidBodyParams(wind=(1.0, 0.5, 0.0))
    mpc = LinearMPC(
        LinearMPCConfig(horizon=10, admm_iterations=40,
                        use_fused_controller=True, tightening_factor=1.0)
    )
    cfg = FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8,
                           fallback_error_m=2.0)
    ogp = OnlineFusedGPConfig(
        gp=ResidualGPConfig(max_data_points=64, residual_gain=1.0),
        refit_every=64, min_samples=16,
    )
    outs = jax.jit(
        lambda: mpc_flight_rollout(
            mpc, circle_ref, 320, body=windy, cfg=cfg, online_gp=ogp,
            gp_gain=1.0,
        )
    )()
    assert np.isfinite(np.asarray(outs["state"])).all()
    assert int(outs["gp_count"][-1]) > 16       # learning happened
    assert rms(outs, tail=160) < 1.0            # and the loop stays sane


def test_fused_tick_highest_precision_parity_tight():
    """Per-kernel parity at loop precision 'highest' (VERDICT round-2 weak
    #5): the whole-tick kernel vs the staged XLA path over a 200-tick
    closed loop must agree to the f32-accumulation level (<=2e-5 position),
    much tighter than the 5e-4 flight bar used for the bf16 modes."""
    mpc_f = fused_mpc()
    mpc_s = LinearMPC(LinearMPCConfig(horizon=10, admm_iterations=40))
    T = 200
    fused = mpc_flight_rollout(
        mpc_f, circle_ref, T,
        cfg=FlightLoopConfig(use_fused_tick=True,
                             fused_tick_loop_precision="highest"),
    )
    staged = mpc_flight_rollout(mpc_s, circle_ref, T, cfg=FlightLoopConfig())
    gap = np.max(
        np.abs(
            np.asarray(fused["state"][:, 0:3])
            - np.asarray(staged["state"][:, 0:3])
        )
    )
    assert gap < 2e-5, gap


def test_sweep_gp_rate_divider_parity(rng):
    """batched_mpc_flight_sweep(gp_every=5): multi-rate GP evaluation (the
    reference's own 10 Hz-MPC-vs-100 Hz-plant pattern) must track the
    every-tick GP closely — the held disturbances change slowly along the
    warm-start trajectory (measured 2e-5 m RMS shift at B=1024 on v5e)."""
    from unmanned_aerial_vehicles_tpu.loop.closed_loop import (
        batched_mpc_flight_sweep,
    )

    X = jnp.asarray(rng.normal(size=(64, 10)), jnp.float32)
    Y = jnp.asarray(0.05 * rng.normal(size=(64, 6)), jnp.float32)
    gcfg = ResidualGPConfig()
    post = fit_residual_gp(X, Y, gcfg)
    rf = lambda Xg, Ug: build_horizon_residuals(post, Xg, Ug, gcfg)
    mpc = fused_mpc()
    starts = jnp.zeros((4, 12), jnp.float32).at[:, 2].set(3.0)
    starts = starts.at[:, 0].set(
        jnp.linspace(-0.3, 0.3, 4, dtype=jnp.float32)
    )
    T = 100
    exact = batched_mpc_flight_sweep(
        mpc, circle_ref, T, starts, residual_fn=rf
    )
    held = batched_mpc_flight_sweep(
        mpc, circle_ref, T, starts, residual_fn=rf, gp_every=5
    )
    gap = np.max(
        np.abs(np.asarray(exact["state"]) - np.asarray(held["state"]))
    )
    assert gap < 5e-3, gap
    # and it must differ from zero somewhere (the divider is really active)
    assert gap > 0.0


def test_mid_flight_checkpoint_resume(tmp_path):
    """Elastic recovery the reference lacks (its checkpoints are GP models
    only; no mid-run resume anywhere — SURVEY section 5): a fused online
    flight saved at a dispatch boundary and resumed from disk must be
    BIT-EXACT vs the uninterrupted flight, ring buffer included."""
    from unmanned_aerial_vehicles_tpu.io import (
        load_resume_state,
        save_resume_state,
    )

    mpc = fused_mpc(admm_iterations=20)
    cfg = FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=4)
    ogp = OnlineFusedGPConfig(
        gp=ResidualGPConfig(max_data_points=256), refit_every=32,
        min_samples=10,
    )
    body = RigidBodyParams(wind=(0.8, 0.3, 0.0))

    full = mpc_flight_rollout(mpc, circle_ref, 160, body=body, cfg=cfg,
                              online_gp=ogp)
    seg1, rs = mpc_flight_rollout(mpc, circle_ref, 80, body=body, cfg=cfg,
                                  online_gp=ogp, return_resume=True)
    assert rs.tick == 80
    path = str(tmp_path / "resume.npz")
    save_resume_state(path, rs)
    # structure template from a cheap single-dispatch segment
    _, tmpl = mpc_flight_rollout(mpc, circle_ref, 4, body=body, cfg=cfg,
                                 online_gp=ogp, return_resume=True)
    rs2 = load_resume_state(path, tmpl)
    assert rs2.tick == 80
    seg2 = mpc_flight_rollout(mpc, circle_ref, 80, body=body, cfg=cfg,
                              online_gp=ogp, resume=rs2)

    cat = np.concatenate(
        [np.asarray(seg1["state"]), np.asarray(seg2["state"])]
    )
    np.testing.assert_array_equal(cat, np.asarray(full["state"]))
    # ring buffer kept filling across the boundary (capacity not yet hit)
    assert int(seg2["gp_count"][-1]) > int(seg1["gp_count"][-1])
    assert int(seg2["gp_count"][-1]) == int(full["gp_count"][-1])

    # mismatched-config checkpoints fail loudly
    mpc_other = fused_mpc(horizon=5, admm_iterations=20)
    _, tmpl_other = mpc_flight_rollout(
        mpc_other, circle_ref, 4, body=body,
        cfg=cfg, online_gp=ogp, return_resume=True,
    )
    with pytest.raises(ValueError, match="mismatch"):
        load_resume_state(path, tmpl_other)

    # resume off a dispatch boundary is rejected
    with pytest.raises(ValueError, match="dispatch boundary"):
        mpc_flight_rollout(mpc, circle_ref, 80, body=body, cfg=cfg,
                           online_gp=ogp,
                           resume=rs2.replace(tick=81))


# ---------------------------------------------------------------------------
# opt-in standardized-input (ARD) online GP (VERDICT round-3 weak #6)
# ---------------------------------------------------------------------------


def test_standardized_ard_posterior_fused_matches_staged():
    """An ARD (standardized-input-equivalent) posterior through the
    multi-tick kernel must match the staged residual_fn path as tightly as
    the isotropic one — pins the kernel's per-dim ``inv_ls`` lanes (the
    scaled mode changes ONLY those operand values)."""
    from unmanned_aerial_vehicles_tpu.gp.residual_gp import (
        ResidualDataset,
        fit_residual_gp_masked,
        masked_input_stats,
        standardized_params,
    )

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
    post = fit_residual_gp_masked(
        ds, gcfg, params=standardized_params(ds, gcfg),
        x_shift=masked_input_stats(ds)[0],
    )
    ls = np.asarray(post.params.length_scale)
    assert ls.shape == (10,) and ls.std() > 0.1   # ARD really engaged
    assert post.x_shift is not None               # centered fit engaged

    mpc = fused_mpc()
    rf = lambda Xg, Ug: build_horizon_residuals(post, Xg, Ug, gcfg)
    T = 80
    staged = mpc_flight_rollout(
        mpc, circle_ref, T, cfg=FlightLoopConfig(use_fused_tick=True),
        residual_fn=rf,
    )
    fused = mpc_flight_rollout(
        mpc, circle_ref, T,
        cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8,
                             fused_tick_loop_precision="highest"),
        gp_posterior=post, gp_gain=gcfg.residual_gain,
    )
    np.testing.assert_allclose(
        np.asarray(staged["state"]), np.asarray(fused["state"]), atol=2e-4
    )


def test_online_standardized_inputs_fused_matches_staged_system():
    """ONLINE scaled mode: the fused multi-tick path with
    ``standardize_inputs=True`` must produce the same learning dynamics as
    enabling the flag alone changes — vs its own unscaled run the ARD
    refits must actually change the flight, and the run must stay healthy
    under wind."""
    windy = RigidBodyParams(wind=(1.2, 0.6, 0.0))
    mpc = fused_mpc(horizon=10, admm_iterations=40)
    cfg = FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8)
    base = dict(
        gp=ResidualGPConfig(max_data_points=128, residual_gain=1.0),
        refit_every=64, min_samples=16,
    )
    T = 320
    runs = {}
    for name, std in (("raw", False), ("scaled", True)):
        ogp = OnlineFusedGPConfig(**base, standardize_inputs=std)
        runs[name] = jax.jit(
            lambda o=ogp: mpc_flight_rollout(
                mpc, circle_ref, T, body=windy, cfg=cfg, online_gp=o,
                gp_gain=1.0,
            )
        )()
    for outs in runs.values():
        assert np.isfinite(np.asarray(outs["state"])).all()
        assert int(outs["gp_count"][-1]) > 16
    # the flag is live: post-refit trajectories diverge between modes
    gap = np.max(
        np.abs(np.asarray(runs["raw"]["state"])
               - np.asarray(runs["scaled"]["state"]))
    )
    assert gap > 1e-4, gap
    # and the scaled mode keeps tracking sane (its win is measured on TPU
    # in the windy-fig8 campaign row; CPU-sized runs only guard health)
    assert rms(runs["scaled"], tail=160) < 1.0


# ---------------------------------------------------------------------------
# online learning composed with the estimator (online + noisy)
# ---------------------------------------------------------------------------


def test_online_noisy_clean_sensors_matches_online_truth():
    """online_gp on the NOISY fused multi-tick path (the GP trains on EKF
    estimates — the reference's EKF2-fed capture, mpc.py:1889-1907,
    2016-2021): with near-noiseless sensors the estimate collapses onto
    the truth, so the captured dataset, the refits and the flight must all
    match the truth-capture online path."""
    from unmanned_aerial_vehicles_tpu.estimation import (
        EKFConfig,
        noisy_mpc_flight_rollout,
    )

    steps = 400
    mpc = fused_mpc(horizon=20, admm_iterations=40)
    cfg = FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8)
    ogp = OnlineFusedGPConfig(
        gp=ResidualGPConfig(max_data_points=128), refit_every=200,
        min_samples=30,
    )
    clean = EKFConfig(r_pos=1e-5, r_att=1e-5, r_rate=1e-5,
                      p0_pos=1e-4, p0_vel=1e-4, p0_att=1e-4, p0_rate=1e-4)
    truth = jax.jit(lambda: mpc_flight_rollout(
        mpc, circle_ref, steps, cfg=cfg, online_gp=ogp
    ))()
    noisy = jax.jit(lambda: noisy_mpc_flight_rollout(
        mpc, circle_ref, steps, jax.random.PRNGKey(0), ekf_cfg=clean,
        cfg=cfg, online_gp=ogp
    ))()
    assert int(noisy["gp_count"][-1]) == int(truth["gp_count"][-1])
    gap = np.abs(np.asarray(truth["state"][:, 0:3])
                 - np.asarray(noisy["state"][:, 0:3])).max()
    assert gap < 0.05, gap


def test_online_noisy_learns_wind_from_estimates():
    """The full composition: wind + noisy sensors + in-flight learning.
    The GP trained on EKF ESTIMATES must still recover a substantial share
    of the wind-induced tracking penalty (the plain noisy flight is the
    baseline) — learning survives estimation noise."""
    from unmanned_aerial_vehicles_tpu.estimation import (
        EKFConfig,
        noisy_mpc_flight_rollout,
    )

    windy = RigidBodyParams(wind=(1.5, 0.8, 0.0))
    steps = 1600  # 32 s

    def ref(t):
        pos, yaw = ramped_figure8_reference(t, amplitude=6.0, frequency=0.02)
        return pos + jnp.array([0.0, 0.0, 3.0]), yaw

    mpc = fused_mpc(horizon=20, admm_iterations=60)
    cfg = FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8)
    ekf_cfg = EKFConfig()

    plain = jax.jit(lambda: noisy_mpc_flight_rollout(
        mpc, ref, steps, jax.random.PRNGKey(2), ekf_cfg=ekf_cfg,
        body=windy, cfg=cfg, preview=True
    ))()
    ogp = OnlineFusedGPConfig(
        gp=ResidualGPConfig(max_data_points=256, residual_gain=1.0),
        refit_every=200,
    )
    online = jax.jit(lambda: noisy_mpc_flight_rollout(
        mpc, ref, steps, jax.random.PRNGKey(2), ekf_cfg=ekf_cfg,
        body=windy, cfg=cfg, preview=True, online_gp=ogp, gp_gain=1.0
    ))()

    r_plain = rms(plain, tail=800)
    r_online = rms(online, tail=800)
    assert int(online["gp_count"][-1]) > 100
    assert r_online < 0.75 * r_plain, (r_online, r_plain)


def test_online_noisy_requires_multitick():
    from unmanned_aerial_vehicles_tpu.estimation import (
        noisy_mpc_flight_rollout,
    )

    mpc = fused_mpc()
    ogp = OnlineFusedGPConfig(gp=ResidualGPConfig(max_data_points=64))
    with pytest.raises(ValueError, match="multi-tick"):
        noisy_mpc_flight_rollout(
            mpc, circle_ref, 8, jax.random.PRNGKey(0),
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=1),
            online_gp=ogp,
        )
