"""12-state EKF + noisy-sensor closed loop (estimation/).

The reference consumes PX4-EKF2 output and never runs an estimator of its
own; these tests pin the in-graph replacement: the filter beats the raw
sensors, covariance stays bounded/symmetric, yaw innovations wrap, and a
full sensors->EKF->MPC->plant flight tracks close to the perfect-state
loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unmanned_aerial_vehicles_tpu.control.mpc_linear import (
    LinearMPC,
    LinearMPCConfig,
)
from unmanned_aerial_vehicles_tpu.estimation import (
    EKFConfig,
    ekf_init,
    ekf_step,
    measure,
    noisy_mpc_flight_rollout,
)
from unmanned_aerial_vehicles_tpu.loop import mpc_flight_rollout
from unmanned_aerial_vehicles_tpu.models import (
    RateLoopParams,
    RigidBodyParams,
    px4_rate_tracking_step,
)
from unmanned_aerial_vehicles_tpu.trajectories import ramped_circle_reference


def _circle(t):
    pos, _, yaw = ramped_circle_reference(t, amplitude=2.0, height=3.0)
    return pos, yaw


def _run_filter(steps=400, seed=0, control=None, x0=None):
    """True plant + noisy sensors + EKF, open loop (constant command)."""
    cfg = EKFConfig()
    body, rl, dt = RigidBodyParams(), RateLoopParams(), 0.02
    control = (
        jnp.asarray([1.0, 0.05, -0.03, 0.02], jnp.float32)
        if control is None else control
    )
    if x0 is None:
        x0 = jnp.zeros(12, jnp.float32).at[2].set(3.0)
    keys = jax.random.split(jax.random.PRNGKey(seed), steps)

    def step(carry, k):
        s, ekf = carry
        z = measure(s, k, cfg)
        ekf, x_est = ekf_step(ekf, control, z, body, rl, dt, cfg)
        s_new = px4_rate_tracking_step(s, control, body, rl, dt)
        return (s_new, ekf), {"true": s, "est": x_est, "z": z}

    # start the estimate OFF the truth to exercise convergence
    ekf0 = ekf_init(x0 + 0.2, cfg)
    (s, ekf), outs = jax.jit(
        lambda: jax.lax.scan(step, (x0, ekf0), keys)
    )()
    return {k: np.asarray(v) for k, v in outs.items()}, np.asarray(ekf.P)


def test_ekf_beats_raw_measurements():
    outs, P = _run_filter()
    tail = slice(100, None)   # post-transient
    est_err = np.linalg.norm(outs["est"][tail, 0:3] - outs["true"][tail, 0:3],
                             axis=1)
    meas_err = np.linalg.norm(outs["z"][tail, 0:3] - outs["true"][tail, 0:3],
                              axis=1)
    assert est_err.mean() < 0.6 * meas_err.mean(), (
        est_err.mean(), meas_err.mean(),
    )
    # unmeasured velocities are reconstructed to useful accuracy
    vel_err = np.linalg.norm(outs["est"][tail, 3:6] - outs["true"][tail, 3:6],
                             axis=1)
    assert vel_err.mean() < 0.15


def test_ekf_covariance_bounded_symmetric():
    _, P = _run_filter(steps=300)
    assert np.allclose(P, P.T, atol=1e-6)
    eigs = np.linalg.eigvalsh(P.astype(np.float64))
    assert eigs.min() > 0.0
    assert eigs.max() < 1.0   # converged, not blown up


def test_ekf_yaw_wrap():
    """An estimate just below +pi fusing measurements just above -pi must
    not traverse the whole circle."""
    cfg = EKFConfig()
    body, rl, dt = RigidBodyParams(), RateLoopParams(), 0.02
    x_true = jnp.zeros(12, jnp.float32).at[2].set(3.0).at[8].set(jnp.pi - 0.02)
    control = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
    ekf = ekf_init(x_true, cfg)
    # measurement with yaw wrapped past the seam
    z = jnp.asarray(np.concatenate([
        np.asarray(x_true[0:3]),
        [0.0, 0.0, -np.pi + 0.02],
        np.asarray(x_true[9:12]),
    ]), jnp.float32)
    ekf, x_est = jax.jit(
        lambda e, zz: ekf_step(e, control, zz, body, rl, dt, cfg)
    )(ekf, z)
    # the fused yaw stays near the seam (magnitude ~pi), not near 0
    assert abs(abs(float(x_est[8])) - np.pi) < 0.1


def test_noisy_closed_loop_tracks():
    steps = 500
    mpc = LinearMPC(LinearMPCConfig(horizon=10, admm_iterations=40),
                    dtype=jnp.float32)
    ideal = jax.jit(lambda: mpc_flight_rollout(mpc, _circle, steps))()
    noisy = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc, _circle, steps, jax.random.PRNGKey(0)
        )
    )()

    def rms(outs):
        err = np.linalg.norm(
            np.asarray(outs["pos_ref"] - outs["state"][:, 0:3]), axis=1
        )
        return float(np.sqrt((err[100:] ** 2).mean()))

    r_ideal, r_noisy = rms(ideal), rms(noisy)
    assert np.isfinite(np.asarray(noisy["state"])).all()
    # estimator-in-the-loop costs little tracking accuracy
    assert r_noisy < r_ideal + 0.15, (r_noisy, r_ideal)
    # the estimate follows the truth
    est_err = np.linalg.norm(
        np.asarray(noisy["state_est"][:, 0:3] - noisy["state"][:, 0:3]),
        axis=1,
    )
    assert est_err[100:].mean() < 0.05
    assert np.isfinite(np.asarray(noisy["final_covariance"])).all()


def test_noisy_fused_matches_staged():
    """fly --noisy --fast (VERDICT round-2 #7): the fused tick kernel takes
    a separate controller-state row, so the MPC + allocation fly the EKF
    estimate while the in-kernel plant integrates the truth. Same PRNG
    stream, same EKF -> the fused path must track the staged noisy loop
    within the f32 kernel-vs-XLA tolerance, and its tracking RMS must stay
    within 0.05 m of staged (the measured estimator cost bar)."""
    from unmanned_aerial_vehicles_tpu.loop import FlightLoopConfig

    steps = 300
    mpc_s = LinearMPC(LinearMPCConfig(horizon=10, admm_iterations=40),
                      dtype=jnp.float32)
    mpc_f = LinearMPC(
        LinearMPCConfig(horizon=10, admm_iterations=40,
                        use_fused_controller=True),
        dtype=jnp.float32,
    )
    staged = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc_s, _circle, steps, jax.random.PRNGKey(0)
        )
    )()
    fused = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc_f, _circle, steps, jax.random.PRNGKey(0),
            cfg=FlightLoopConfig(use_fused_tick=True),
        )
    )()

    def rms(outs):
        err = np.linalg.norm(
            np.asarray(outs["pos_ref"] - outs["state"][:, 0:3]), axis=1
        )
        return float(np.sqrt((err[100:] ** 2).mean()))

    assert np.isfinite(np.asarray(fused["state"])).all()
    # identical PRNG + EKF: trajectories glue together up to kernel-vs-XLA
    # f32 differences amplified by feedback
    gap = np.abs(
        np.asarray(staged["state"][:, 0:3]) - np.asarray(fused["state"][:, 0:3])
    ).max()
    assert gap < 5e-3, gap
    assert abs(rms(fused) - rms(staged)) < 0.05


@pytest.mark.parametrize("K", [8, 20])
def test_noisy_multitick_matches_staged(K):
    """EKF INSIDE the multi-tick kernel (estimation at the latency tier):
    covariance as a padded VMEM operand, nine sequential scalar measurement
    fusions, F relinearised PER TICK from the in-kernel analytic Jacobian
    (the exact RK4 chain rule — same F as the staged jacfwd up to f32
    rounding). Same PRNG stream as the staged loop -> trajectories must
    glue to rounding level, independent of dispatch length (measured
    1.7e-6 m at BOTH K=8 and K=20 over 240 ticks; the rounds-2/3
    per-dispatch frozen F sat at 4e-4 m and grew with K)."""
    from unmanned_aerial_vehicles_tpu.loop import FlightLoopConfig

    steps = 240
    staged = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            LinearMPC(LinearMPCConfig(horizon=10, admm_iterations=40),
                      dtype=jnp.float32),
            _circle, steps, jax.random.PRNGKey(0),
        )
    )()
    mpc_f = LinearMPC(
        LinearMPCConfig(horizon=10, admm_iterations=40,
                        use_fused_controller=True),
        dtype=jnp.float32,
    )
    multi = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc_f, _circle, steps, jax.random.PRNGKey(0),
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=K),
        )
    )()
    gap = np.abs(
        np.asarray(staged["state"][:, 0:3])
        - np.asarray(multi["state"][:, 0:3])
    ).max()
    assert gap < 1e-4, gap
    est_gap = np.abs(
        np.asarray(staged["state_est"][:, 0:3])
        - np.asarray(multi["state_est"][:, 0:3])
    ).max()
    assert est_gap < 1e-4, est_gap
    est_err = np.linalg.norm(
        np.asarray(multi["state_est"][:, 0:3] - multi["state"][:, 0:3]),
        axis=1,
    )
    assert est_err[80:].mean() < 0.05       # the estimate follows the truth
    P = np.asarray(multi["final_covariance"])
    assert np.isfinite(P).all()
    np.testing.assert_allclose(P, P.T, atol=1e-5)   # symmetric

    # opt-in "dispatch" relinearisation cadence (EKFConfig.relinearize_every):
    # F frozen at the dispatch-entry estimate — cheaper per tick, with a
    # BOUNDED covariance-drift cost that must stay strictly above the exact
    # per-tick mode's gap (both cadences bounded at K=8 AND K=20)
    frozen = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc_f, _circle, steps, jax.random.PRNGKey(0),
            ekf_cfg=EKFConfig(relinearize_every="dispatch"),
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=K),
        )
    )()
    gap_frozen = np.abs(
        np.asarray(staged["state"][:, 0:3])
        - np.asarray(frozen["state"][:, 0:3])
    ).max()
    assert gap_frozen < 5e-3, gap_frozen     # small, bounded drift
    assert gap < gap_frozen                  # exact mode is strictly tighter
    Pf = np.asarray(frozen["final_covariance"])
    assert np.isfinite(Pf).all()

    # opt-in bf16 covariance-propagation dots (EKFConfig.cov_precision):
    # the rounding enters only the covariance (Kalman-gain quality), never
    # the estimate arithmetic directly — P must stay finite/symmetric-ish
    # and the truth trajectory must stay within a bounded drift of the
    # staged filter at BOTH dispatch lengths
    bf16 = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc_f, _circle, steps, jax.random.PRNGKey(0),
            ekf_cfg=EKFConfig(cov_precision="bf16"),
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=K),
        )
    )()
    gap_bf16 = np.abs(
        np.asarray(staged["state"][:, 0:3])
        - np.asarray(bf16["state"][:, 0:3])
    ).max()
    assert gap_bf16 < 2e-2, gap_bf16         # bounded drift (CPU interpret
    # runs the dots in f32, so the real bf16 bound is pinned on-chip in
    # tests_tpu::test_noisy_multitick_bf16_cov_on_chip)
    est_err_b = np.linalg.norm(
        np.asarray(bf16["state_est"][:, 0:3] - bf16["state"][:, 0:3]), axis=1
    )
    assert est_err_b[80:].mean() < 0.05      # filter still converges
    Pb = np.asarray(bf16["final_covariance"])
    assert np.isfinite(Pb).all()
    np.testing.assert_allclose(Pb, Pb.T, atol=1e-4)


def test_noisy_multitick_rejects_residual_fn():
    """The multi-tick noisy path computes the GP in-kernel: a staged
    residual_fn hook (without the raw posterior) is rejected with the
    supported route named."""
    from unmanned_aerial_vehicles_tpu.loop import FlightLoopConfig

    mpc = LinearMPC(
        LinearMPCConfig(horizon=5, admm_iterations=10,
                        use_fused_controller=True),
        dtype=jnp.float32,
    )
    try:
        noisy_mpc_flight_rollout(
            mpc, _circle, 8, jax.random.PRNGKey(0),
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8),
            residual_fn=lambda X, U: jnp.zeros((5, 6), jnp.float32),
        )
    except ValueError as e:
        assert "gp_posterior" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_noisy_multitick_rejects_bad_cov_precision():
    """Unknown EKFConfig.cov_precision fails loudly with the choices named
    (a typo must not silently fly the HIGHEST path)."""
    from unmanned_aerial_vehicles_tpu.loop import FlightLoopConfig

    mpc = LinearMPC(
        LinearMPCConfig(horizon=5, admm_iterations=10,
                        use_fused_controller=True),
        dtype=jnp.float32,
    )
    with pytest.raises(ValueError, match="cov_precision"):
        noisy_mpc_flight_rollout(
            mpc, _circle, 8, jax.random.PRNGKey(0),
            ekf_cfg=EKFConfig(cov_precision="fp8"),
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8),
        )


def test_noisy_loop_matches_ideal_with_clean_sensors():
    """Pin against divergence between noisy_mpc_flight_rollout's step and
    the staged mpc_flight_rollout it mirrors (loop/closed_loop.py): with
    near-noiseless sensors the two must fly the same trajectory."""
    steps = 300
    clean = EKFConfig(r_pos=1e-4, r_att=1e-4, r_rate=1e-4,
                      p0_pos=1e-3, p0_vel=1e-3, p0_att=1e-3, p0_rate=1e-3)
    mpc = LinearMPC(LinearMPCConfig(horizon=10, admm_iterations=40),
                    dtype=jnp.float32)
    ideal = jax.jit(lambda: mpc_flight_rollout(mpc, _circle, steps))()
    noisy = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc, _circle, steps, jax.random.PRNGKey(0), ekf_cfg=clean
        )
    )()
    gap = np.abs(
        np.asarray(ideal["state"][:, 0:3]) - np.asarray(noisy["state"][:, 0:3])
    ).max()
    assert gap < 0.02, gap


def test_noisy_multitick_gp_preview_matches_staged():
    """The full combination at the latency tier: EKF in-kernel + GP
    residuals in-kernel (features from the ESTIMATE trajectory) + preview
    references — must glue to the staged noisy GP+preview loop on the same
    PRNG stream (measured 3.5e-4 m over 240 ticks)."""
    from unmanned_aerial_vehicles_tpu.gp import (
        build_horizon_residuals,
        fit_residual_gp,
    )
    from unmanned_aerial_vehicles_tpu.gp.residual_gp import ResidualGPConfig
    from unmanned_aerial_vehicles_tpu.loop import FlightLoopConfig

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(64, 10)), jnp.float32)
    Y = jnp.asarray(0.05 * rng.normal(size=(64, 6)), jnp.float32)
    gcfg = ResidualGPConfig()
    post = fit_residual_gp(X, Y, gcfg)
    rf = lambda Xg, Ug: build_horizon_residuals(post, Xg, Ug, gcfg)
    steps = 240
    staged = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            LinearMPC(LinearMPCConfig(horizon=10, admm_iterations=40),
                      dtype=jnp.float32),
            _circle, steps, jax.random.PRNGKey(0), residual_fn=rf,
            preview=True,
        )
    )()
    mpc_f = LinearMPC(
        LinearMPCConfig(horizon=10, admm_iterations=40,
                        use_fused_controller=True),
        dtype=jnp.float32,
    )
    multi = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc_f, _circle, steps, jax.random.PRNGKey(0),
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8),
            gp_posterior=post, gp_gain=gcfg.residual_gain, preview=True,
        )
    )()
    gap = np.abs(
        np.asarray(staged["state"][:, 0:3])
        - np.asarray(multi["state"][:, 0:3])
    ).max()
    assert gap < 5e-3, gap


def test_noisy_multitick_dob_matches_staged():
    """The 15-state disturbance observer INSIDE the multi-tick kernel:
    augmented covariance rides the same padded (128,128) operand, the
    filter predicts with the NOMINAL plant row while the in-kernel plant
    integrates the windy truth, and the estimate feeds the MPC as in-kernel
    residual feedforward. Must glue to the staged ``dekf_step`` loop on the
    same PRNG stream (measured ~5e-6 over 96 ticks at K=8)."""
    from unmanned_aerial_vehicles_tpu.loop import FlightLoopConfig
    from unmanned_aerial_vehicles_tpu.models.params import RigidBodyParams

    steps = 240
    body = RigidBodyParams().replace(wind=(1.5, 0.8, 0.0))
    staged = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            LinearMPC(LinearMPCConfig(horizon=10, admm_iterations=40),
                      dtype=jnp.float32),
            _circle, steps, jax.random.PRNGKey(0), body=body,
            disturbance_observer=True,
        )
    )()
    mpc_f = LinearMPC(
        LinearMPCConfig(horizon=10, admm_iterations=40,
                        use_fused_controller=True),
        dtype=jnp.float32,
    )
    fused = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc_f, _circle, steps, jax.random.PRNGKey(0), body=body,
            disturbance_observer=True,
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8),
        )
    )()
    gap = np.abs(
        np.asarray(staged["state"][:, 0:3])
        - np.asarray(fused["state"][:, 0:3])
    ).max()
    assert gap < 1e-4, gap
    d_gap = np.abs(
        np.asarray(staged["disturbance_est"])
        - np.asarray(fused["disturbance_est"])
    ).max()
    assert d_gap < 1e-4, d_gap
    # the observer is actually working: the settled estimate carries the
    # along-wind acceleration gap (non-trivial magnitude, +x dominant)
    d_tail = np.asarray(fused["disturbance_est"])[steps // 2:].mean(axis=0)
    assert d_tail[0] > 0.5, d_tail
    P = np.asarray(fused["final_covariance"])
    assert P.shape == (15, 15)
    assert np.isfinite(P).all()


def test_noisy_multitick_dob_composes_with_gp():
    """Observer + GP on the fused tier must SUM on the residual lanes —
    the staged path's ``residuals + dob_rows`` composition, now with both
    terms computed inside the kernel."""
    from unmanned_aerial_vehicles_tpu.gp import (
        build_horizon_residuals,
        fit_residual_gp,
    )
    from unmanned_aerial_vehicles_tpu.gp.residual_gp import ResidualGPConfig
    from unmanned_aerial_vehicles_tpu.loop import FlightLoopConfig
    from unmanned_aerial_vehicles_tpu.models.params import RigidBodyParams

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(64, 10)), jnp.float32)
    Y = jnp.asarray(0.05 * rng.normal(size=(64, 6)), jnp.float32)
    gcfg = ResidualGPConfig()
    post = fit_residual_gp(X, Y, gcfg)
    rf = lambda Xg, Ug: build_horizon_residuals(post, Xg, Ug, gcfg)
    steps = 120
    body = RigidBodyParams().replace(wind=(1.5, 0.8, 0.0))
    staged = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            LinearMPC(LinearMPCConfig(horizon=10, admm_iterations=40),
                      dtype=jnp.float32),
            _circle, steps, jax.random.PRNGKey(0), body=body,
            residual_fn=rf, disturbance_observer=True,
        )
    )()
    mpc_f = LinearMPC(
        LinearMPCConfig(horizon=10, admm_iterations=40,
                        use_fused_controller=True),
        dtype=jnp.float32,
    )
    fused = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc_f, _circle, steps, jax.random.PRNGKey(0), body=body,
            gp_posterior=post, gp_gain=gcfg.residual_gain,
            disturbance_observer=True,
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=8),
        )
    )()
    gap = np.abs(
        np.asarray(staged["state"][:, 0:3])
        - np.asarray(fused["state"][:, 0:3])
    ).max()
    assert gap < 5e-3, gap
    d_gap = np.abs(
        np.asarray(staged["disturbance_est"])
        - np.asarray(fused["disturbance_est"])
    ).max()
    assert d_gap < 5e-3, d_gap


# ---------------------------------------------------------------------------
# 12-state family noisy loop (rigid-body EKF, noisy_rigid_mpc_rollout)
# ---------------------------------------------------------------------------


def _rigid_truth_flight(eng, steps, dt=0.02):
    """Per-tick truth-state loop (the cli fly12 shape) for comparison."""
    from unmanned_aerial_vehicles_tpu.models import (
        X500_PARAMS,
        rigid_body_rk4_step,
    )

    def step(c, i):
        st, mc = c
        t = i.astype(jnp.float32) * dt
        pos_ref, yaw_ref = _circle(t)
        u, _, mc = eng.solve(mc, st, jnp.asarray(pos_ref, jnp.float32),
                             jnp.asarray(yaw_ref, jnp.float32))
        st = rigid_body_rk4_step(st, u, X500_PARAMS, dt)
        return (st, mc), {"state": st, "pos_ref": pos_ref}

    x0 = jnp.zeros(12, jnp.float32).at[2].set(3.0)
    (_, _), outs = jax.lax.scan(step, (x0, eng.init_carry(x0)),
                                jnp.arange(steps))
    return outs


def test_noisy_rigid_clean_sensors_matches_truth_flight():
    """With near-noiseless sensors the 12-state noisy loop must fly the
    truth-state per-tick loop's trajectory (pins the loop structure: same
    solve semantics, EKF collapses onto the measurement)."""
    from unmanned_aerial_vehicles_tpu.control.mpc_rigid import RigidBodyMPC
    from unmanned_aerial_vehicles_tpu.estimation.noisy_loop import (
        noisy_rigid_mpc_rollout,
    )

    steps = 120
    eng = RigidBodyMPC()
    clean = EKFConfig(r_pos=1e-4, r_att=1e-4, r_rate=1e-4,
                      p0_pos=1e-3, p0_vel=1e-3, p0_att=1e-3, p0_rate=1e-3)
    truth = jax.jit(lambda: _rigid_truth_flight(eng, steps))()
    noisy = jax.jit(lambda: noisy_rigid_mpc_rollout(
        eng, _circle, steps, jax.random.PRNGKey(0), ekf_cfg=clean
    ))()
    gap = np.abs(np.asarray(truth["state"][:, 0:3])
                 - np.asarray(noisy["state"][:, 0:3])).max()
    assert gap < 0.03, gap


def test_noisy_rigid_filter_beats_raw_sensors():
    """At the default sensor noise the EKF's position estimate must be
    closer to the truth than the raw measurements (the filter earns its
    place), velocity (unmeasured) must be reconstructed to the same grade,
    and the flight must still track."""
    from unmanned_aerial_vehicles_tpu.control.mpc_rigid import RigidBodyMPC
    from unmanned_aerial_vehicles_tpu.estimation.noisy_loop import (
        noisy_rigid_mpc_rollout,
    )

    steps = 240
    eng = RigidBodyMPC()
    cfg = EKFConfig()
    outs = jax.jit(lambda: noisy_rigid_mpc_rollout(
        eng, _circle, steps, jax.random.PRNGKey(3), ekf_cfg=cfg
    ))()
    st = np.asarray(outs["state"])
    est = np.asarray(outs["state_est"])
    meas = np.asarray(outs["meas_pos"])
    assert np.isfinite(st).all() and np.isfinite(est).all()

    skip = 40  # transient: P converges from p0
    est_err = np.sqrt(np.mean(np.sum(
        (est[skip:, 0:3] - st[skip:, 0:3]) ** 2, -1)))
    meas_err = np.sqrt(np.mean(np.sum(
        (meas[skip:] - st[skip:, 0:3]) ** 2, -1)))
    assert est_err < meas_err, (est_err, meas_err)

    vel_err = np.sqrt(np.mean(np.sum(
        (est[skip:, 3:6] - st[skip:, 3:6]) ** 2, -1)))
    assert vel_err < 0.2, vel_err

    refs = np.asarray(outs["pos_ref"])
    rms = float(np.sqrt(np.mean(np.sum((st[:, 0:3] - refs) ** 2, -1))))
    truth = jax.jit(lambda: _rigid_truth_flight(eng, steps))()
    rms_truth = float(np.sqrt(np.mean(np.sum(
        (np.asarray(truth["state"][:, 0:3])
         - np.asarray(truth["pos_ref"])) ** 2, -1))))
    # estimator-induced degradation is bounded
    assert rms < rms_truth + 0.1, (rms, rms_truth)


def test_noisy_rigid_family_surface():
    """The same loop flies every yaw-channel 12-state engine (iLQR, MPPI)
    — the shared solve(carry, x, pos, yaw) surface the CLI routes."""
    from unmanned_aerial_vehicles_tpu.control import (
        ILQRRigidBodyMPC,
        MPPIConfig,
        MPPIController,
    )
    from unmanned_aerial_vehicles_tpu.estimation.noisy_loop import (
        noisy_rigid_mpc_rollout,
    )

    steps = 40
    for eng in (ILQRRigidBodyMPC(iterations=1),
                MPPIController(MPPIConfig(horizon=10, num_samples=128))):
        outs = jax.jit(lambda e=eng: noisy_rigid_mpc_rollout(
            e, _circle, steps, jax.random.PRNGKey(1)
        ))()
        st = np.asarray(outs["state"])
        assert np.isfinite(st).all()
        assert abs(st[-1, 2] - 3.0) < 1.5  # holds altitude


def test_noisy_ltv_multirate_estimator_in_the_loop():
    """ltv12's estimation tier: plant + rigid-body EKF at 100 Hz, the LTV
    solve every 10th plant tick flying the ESTIMATE (the reference's
    100 Hz plant / 10 Hz cvxpy rate split, main.py:814-826, with the
    PX4-EKF2 role in-graph). Pins: finite flight, the filter beats the
    raw position sensor, and tracking stays close to the reference
    circle."""
    from unmanned_aerial_vehicles_tpu.control import LTVTrackingMPC
    from unmanned_aerial_vehicles_tpu.estimation.noisy_loop import (
        noisy_ltv_rollout,
    )

    ldt = 0.1
    mpc_ltv = LTVTrackingMPC(horizon=10)
    n = mpc_ltv.mpc.config.horizon

    def window_at(i):
        ts = (i + jnp.arange(n + 1)).astype(jnp.float32) * ldt

        def ref12(t):
            pos, _, _ = ramped_circle_reference(t, amplitude=1.5, height=3.0)
            return jnp.concatenate(
                [jnp.asarray(pos, jnp.float32), jnp.zeros(9, jnp.float32)]
            )

        return jax.vmap(ref12)(ts)

    steps10 = 16
    outs = jax.jit(lambda: noisy_ltv_rollout(
        mpc_ltv, window_at, steps10, jax.random.PRNGKey(5)
    ))()
    st = np.asarray(outs["state"])
    est = np.asarray(outs["state_est"])
    meas = np.asarray(outs["meas_pos"])
    assert np.isfinite(st).all() and np.isfinite(est).all()

    # meas_pos[i] samples the END of tick i == start of tick i+1
    skip = 4  # transient: P converges from p0
    est_err = np.sqrt(np.mean(np.sum(
        (est[skip + 1:, 0:3] - st[skip + 1:, 0:3]) ** 2, -1)))
    meas_err = np.sqrt(np.mean(np.sum(
        (meas[skip:-1] - st[skip + 1:, 0:3]) ** 2, -1)))
    assert est_err < meas_err, (est_err, meas_err)

    ref_pos = np.asarray(outs["pos_ref"])
    rms = np.sqrt(np.mean(np.sum((st[:, 0:3] - ref_pos) ** 2, -1)))
    assert rms < 0.3, rms
