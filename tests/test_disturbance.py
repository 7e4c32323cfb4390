"""Disturbance-observer EKF (estimation/disturbance.py).

The reference's only mechanism for unmodelled forces is the learned GP
residual; the augmented-state observer is the classical, learning-free
alternative this framework adds. These tests pin: (a) the disturbance
estimate converges to the true nominal-vs-plant acceleration gap, (b)
feeding it forward to the MPC improves windy tracking, (c) it is harmless
on a matched plant, and (d) the fused tiers reject the flag loudly.
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
    DisturbanceEKFConfig,
    EKFConfig,
    dekf_init,
    dekf_step,
    measure,
    noisy_mpc_flight_rollout,
)
from unmanned_aerial_vehicles_tpu.models import (
    RateLoopParams,
    RigidBodyParams,
    px4_rate_tracking_step,
)
from unmanned_aerial_vehicles_tpu.models.px4_surrogate import _derivative
from unmanned_aerial_vehicles_tpu.trajectories import ramped_figure8_reference

WINDY = RigidBodyParams(wind=(1.5, 0.8, 0.0))   # the campaign's windy plant
NOMINAL = RigidBodyParams()


def _fig8(t):
    pos, yaw = ramped_figure8_reference(t, amplitude=2.0, frequency=0.1)
    return pos + jnp.asarray([0.0, 0.0, 3.0], jnp.float32), yaw


def test_disturbance_estimate_converges():
    """Open loop: truth flies the WINDY plant, the observer predicts with
    the nominal model — d must converge to the true accel gap at the
    current state (the same quantity the campaign's oracle row computes
    analytically)."""
    steps = 600
    rl, dt = RateLoopParams(), 0.02
    cfg = DisturbanceEKFConfig()
    control = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
    x0 = jnp.zeros(12, jnp.float32).at[2].set(3.0)
    keys = jax.random.split(jax.random.PRNGKey(0), steps)

    def step(carry, k):
        s, ekf = carry
        z = measure(s, k, cfg.base)
        ekf, x_est, d_est = dekf_step(ekf, control, z, NOMINAL, rl, dt, cfg)
        s_new = px4_rate_tracking_step(s, control, WINDY, rl, dt)
        return (s_new, ekf), {"true": s, "d": d_est}

    (s_fin, ekf), outs = jax.jit(
        lambda: jax.lax.scan(step, (x0, dekf_init(x0, cfg)), keys)
    )()
    d = np.asarray(outs["d"])
    true = np.asarray(outs["true"])
    # expected disturbance at each tick: windy-minus-nominal accel at the
    # TRUE state under the applied control
    expected = np.asarray(
        jax.vmap(
            lambda s: _derivative(s, control, WINDY, rl)[3:6]
            - _derivative(s, control, NOMINAL, rl)[3:6]
        )(jnp.asarray(true))
    )
    tail = slice(300, None)
    gap = np.linalg.norm(d[tail] - expected[tail], axis=1)
    sig = np.linalg.norm(expected[tail], axis=1).mean()
    assert sig > 0.5, "windy scenario should produce a real accel gap"
    assert gap.mean() < 0.25 * sig, (gap.mean(), sig)
    # covariance stays finite and symmetric
    P = np.asarray(ekf.P)
    assert np.isfinite(P).all()
    np.testing.assert_allclose(P, P.T, atol=1e-5)


def test_disturbance_feedforward_improves_windy_tracking():
    """Closed loop on the campaign's windy figure-8: the observer's
    residual feedforward must recover most of the wind-induced tracking
    loss without any learned model."""
    steps, tail = 1200, 600
    # the campaign flight configuration: default horizon/iterations — a
    # short-horizon MPC has too little position authority for the wind
    # offset to be feedforward-limited in the first place
    mpc = LinearMPC(LinearMPCConfig(), dtype=jnp.float32)

    def ref(t):
        # the campaign's figure-8 shape; preview mode so tracking is not
        # dominated by point-target phase lag (the wind-rejection rows in
        # tools/run_campaign.py fly exactly this configuration)
        pos, yaw = ramped_figure8_reference(t)
        return pos + jnp.asarray([0.0, 0.0, 3.0], jnp.float32), yaw

    def fly(dob):
        return jax.jit(
            lambda: noisy_mpc_flight_rollout(
                mpc, ref, steps, jax.random.PRNGKey(0), body=WINDY,
                preview=True, disturbance_observer=dob,
            )
        )()

    plain, dob = fly(None), fly(True)

    def rms(outs):
        err = np.linalg.norm(
            np.asarray(outs["pos_ref"] - outs["state"][:, 0:3]), axis=1
        )
        return float(np.sqrt((err[tail:] ** 2).mean()))

    r_plain, r_dob = rms(plain), rms(dob)
    assert np.isfinite(np.asarray(dob["state"])).all()
    # the observer must recover at least 35% of the windy tracking error
    # (measured: 0.978 -> 0.491 m on this window)
    assert r_dob < 0.65 * r_plain, (r_dob, r_plain)
    # and the estimate itself points into the wind (nonzero, bounded)
    d = np.asarray(dob["disturbance_est"])
    assert 0.2 < np.linalg.norm(d[tail:], axis=1).mean() < 5.0


def test_disturbance_observer_clean_plant_harmless():
    """Matched plant: d stays near zero and tracking is unchanged."""
    steps = 400
    mpc = LinearMPC(LinearMPCConfig(horizon=10, admm_iterations=40),
                    dtype=jnp.float32)

    def fly(dob):
        return jax.jit(
            lambda: noisy_mpc_flight_rollout(
                mpc, _fig8, steps, jax.random.PRNGKey(0), body=NOMINAL,
                disturbance_observer=dob,
            )
        )()

    plain, dob = fly(None), fly(True)

    def rms(outs):
        err = np.linalg.norm(
            np.asarray(outs["pos_ref"] - outs["state"][:, 0:3]), axis=1
        )
        return float(np.sqrt((err[200:] ** 2).mean()))

    # note: d is NOT exactly zero on a matched plant — the observer also
    # absorbs the surrogate-vs-double-integrator model gap the controller
    # feels (attitude lag during accelerating arcs), which is why the
    # matched-plant comparison allows a small band rather than equality
    assert rms(dob) < rms(plain) + 0.08, (rms(dob), rms(plain))
    d = np.asarray(dob["disturbance_est"])
    assert np.linalg.norm(d[200:], axis=1).mean() < 1.0


def test_disturbance_observer_rejects_fused():
    from unmanned_aerial_vehicles_tpu.loop import FlightLoopConfig

    mpc = LinearMPC(
        LinearMPCConfig(horizon=10, use_fused_controller=True),
        dtype=jnp.float32,
    )
    with pytest.raises(ValueError, match="staged path"):
        noisy_mpc_flight_rollout(
            mpc, _fig8, 8, jax.random.PRNGKey(0),
            cfg=FlightLoopConfig(use_fused_tick=True),
            disturbance_observer=True,
        )


def test_disturbance_config_passes_base_noise_model():
    """An explicit DisturbanceEKFConfig's base drives the sensor draws."""
    steps = 60
    mpc = LinearMPC(LinearMPCConfig(horizon=10, admm_iterations=40),
                    dtype=jnp.float32)
    loud = DisturbanceEKFConfig(base=EKFConfig(r_pos=1.0))
    outs = jax.jit(
        lambda: noisy_mpc_flight_rollout(
            mpc, _fig8, steps, jax.random.PRNGKey(0), body=NOMINAL,
            disturbance_observer=loud,
        )
    )()
    meas_err = np.linalg.norm(
        np.asarray(outs["meas_pos"] - outs["state"][:, 0:3]), axis=1
    )
    # r_pos=1.0 must show up in the drawn measurements (default is 0.05)
    assert meas_err.mean() > 0.5
