"""Differentiable closed-loop auto-tuning (tuning.autotune).

The reference has no counterpart (gains are hand-tuned,
``cascade_pid_demo.py:194-210``); these tests pin that the gradient path
through the fused flight rollouts is real: losses drop, tuned controllers
track better than their initialisations, and the traced-weight MPC twin
matches the deployment controller.
"""

import jax
import jax.numpy as jnp
import numpy as np

from unmanned_aerial_vehicles_tpu.control.mpc_linear import (
    LinearMPC,
    LinearMPCConfig,
)
from unmanned_aerial_vehicles_tpu.loop import FlightLoopConfig
from unmanned_aerial_vehicles_tpu.loop.closed_loop import (
    mpc_flight_rollout,
    pid_flight_rollout,
)
from unmanned_aerial_vehicles_tpu.trajectories import ramped_circle_reference
from unmanned_aerial_vehicles_tpu.tuning import (
    TuneConfig,
    mpc_config_from_theta,
    mpc_weights_theta,
    tune_cascade_gains,
    tune_cascade_gains_multistart,
    tune_mpc_weights,
    tune_parameters,
)
from unmanned_aerial_vehicles_tpu.tuning.autotune import _TracedWeightMPC


def _circle(t):
    pos, _, yaw = ramped_circle_reference(t, amplitude=2.0, height=3.0)
    return pos, yaw


def _rms(outs):
    err = np.asarray(outs["state"][:, 0:3]) - np.asarray(outs["pos_ref"])
    return float(np.sqrt((np.linalg.norm(err, axis=1) ** 2).mean()))


def test_tune_parameters_quadratic():
    target = jnp.asarray([1.0, -2.0, 0.5], jnp.float32)

    def loss(p):
        return jnp.sum((p["x"] - target) ** 2)

    params, losses, final_loss = tune_parameters(
        loss, {"x": jnp.zeros(3, jnp.float32)}, iterations=400,
        learning_rate=0.05,
    )
    assert float(final_loss) < 1e-4
    assert float(losses[-1]) < float(losses[0])
    np.testing.assert_allclose(np.asarray(params["x"]), np.asarray(target),
                               atol=1e-2)


def test_tune_cascade_gains_improves_tracking():
    steps = 250
    cfg = TuneConfig(iterations=12, learning_rate=0.08, settle_steps=50,
                     effort_weight=1e-3)
    result = tune_cascade_gains(_circle, steps, tune_cfg=cfg)

    assert np.isfinite(np.asarray(result.losses)).all()
    assert float(result.final_loss) < float(result.initial_loss)

    # re-fly both gain sets: the tuned cascade must track the circle better
    base = jax.jit(lambda: pid_flight_rollout(_circle, steps))()
    tuned = jax.jit(
        lambda: pid_flight_rollout(_circle, steps, gains=result.params)
    )()
    assert _rms(tuned) < _rms(base)

    # positivity (log-space parametrisation) and untouched safety limits
    for layer in ("position", "velocity", "attitude"):
        pid = getattr(result.params, layer)
        assert (np.asarray(pid.kp) > 0).all()
        assert (np.asarray(pid.ki) > 0).all()
        assert (np.asarray(pid.kd) > 0).all()
        ref_pid = getattr(
            type(result.params).default(), layer
        )
        np.testing.assert_array_equal(
            np.asarray(pid.max_output, np.float32),
            np.asarray(ref_pid.max_output, np.float32),
        )


def test_tune_cascade_gains_multistart_picks_best():
    steps = 150
    cfg = TuneConfig(iterations=4, learning_rate=0.08, settle_steps=40)
    result = tune_cascade_gains_multistart(
        _circle, steps, n_starts=3, jitter=0.2, tune_cfg=cfg
    )
    assert np.isfinite(float(result.final_loss))
    # the best-of-starts final loss can never exceed the unjittered start's
    # own tuned loss trace minimum
    single = tune_cascade_gains(_circle, steps, tune_cfg=cfg)
    assert float(result.final_loss) <= float(single.final_loss) + 1e-6


def test_traced_weight_mpc_matches_linear_mpc():
    base = LinearMPCConfig(horizon=8, admm_iterations=200)
    ref = LinearMPC(base, dtype=jnp.float32)
    twin = _TracedWeightMPC(mpc_weights_theta(base), base)

    state = jnp.asarray([1.0, -2.0, 2.0, 0.5, 0.0, -0.1], jnp.float32)
    target = jnp.asarray([0.0, 0.0, 3.0], jnp.float32)
    ca, cb = ref.init_carry(state), twin.init_carry(state)
    for _ in range(3):
        ua, Xa, ca = jax.jit(ref.solve)(ca, state, target)
        ub, Xb, cb = jax.jit(twin.solve)(cb, state, target)
    np.testing.assert_allclose(np.asarray(ua), np.asarray(ub), atol=5e-4)
    np.testing.assert_allclose(np.asarray(Xa), np.asarray(Xb), atol=5e-4)


def test_tune_mpc_weights_improves_tracking():
    steps = 150
    base = LinearMPCConfig(horizon=8, admm_iterations=30)
    # start from a deliberately detuned weight set
    detuned = base.replace(q_pos=(5.0, 5.0, 8.0), r_control=(20.0, 20.0, 10.0, 8.0))
    cfg = TuneConfig(iterations=6, learning_rate=0.15, settle_steps=40)
    result, tuned_config = tune_mpc_weights(
        _circle, steps, base_config=detuned, tune_cfg=cfg,
    )
    assert float(result.final_loss) < float(result.initial_loss)

    # the tuned config must drop into the DEPLOYMENT controller and beat
    # the detuned deployment flight
    loop_cfg = FlightLoopConfig()
    fly = lambda c: jax.jit(
        lambda: mpc_flight_rollout(
            LinearMPC(c, dtype=jnp.float32), _circle, steps, cfg=loop_cfg
        )
    )()
    assert _rms(fly(tuned_config)) < _rms(fly(detuned))
    # tuned weights are plain host floats (jit-static config)
    assert isinstance(tuned_config.q_pos[0], float)


# ---------------------------------------------------------------------------
# Autodiff through the fused Pallas tier (ops.tick_ad, VERDICT round-3 #4)
# ---------------------------------------------------------------------------

_AD_BASE = LinearMPCConfig(horizon=6, use_fused_controller=True)
_AD_STEPS = 8
_AD_LOOP = FlightLoopConfig(
    use_fused_tick=True, ticks_per_dispatch=2, fused_tick_ad=True
)


def _ad_loss(theta, fused: bool):
    """Campaign-style loss through either tier from the SAME weight pytree."""
    from unmanned_aerial_vehicles_tpu.tuning.autotune import _tracking_loss

    if fused:
        mpc = _TracedWeightMPC(theta, _AD_BASE)
        cfg = _AD_LOOP
    else:
        mpc = _TracedWeightMPC(
            theta, _AD_BASE.replace(use_fused_controller=False)
        )
        cfg = FlightLoopConfig()
    outs = mpc_flight_rollout(mpc, _circle, _AD_STEPS, cfg=cfg)
    return _tracking_loss(outs, 2, 1e-3)


def test_fused_tick_ad_forward_identical():
    """The custom_vjp wrapper IS the kernel forward: outputs bit-equal."""
    mpc = LinearMPC(_AD_BASE, dtype=jnp.float32)
    raw = mpc_flight_rollout(
        mpc, _circle, _AD_STEPS,
        cfg=_AD_LOOP.replace(fused_tick_ad=False),
    )
    ad = mpc_flight_rollout(mpc, _circle, _AD_STEPS, cfg=_AD_LOOP)
    np.testing.assert_array_equal(
        np.asarray(raw["state"]), np.asarray(ad["state"])
    )
    np.testing.assert_array_equal(
        np.asarray(raw["u_mpc"]), np.asarray(ad["u_mpc"])
    )


def test_fused_tick_gradient_parity():
    """grad through the fused tier (Pallas forward, staged-twin VJP) matches
    the staged path's jax.grad to well under 1e-5 relative — the tuner now
    optimises the program that actually flies."""
    theta0 = mpc_weights_theta(_AD_BASE)
    lf, gf = jax.jit(
        jax.value_and_grad(lambda th: _ad_loss(th, fused=True))
    )(theta0)
    ls, gs = jax.jit(
        jax.value_and_grad(lambda th: _ad_loss(th, fused=False))
    )(theta0)
    # same closed-loop trajectory -> same loss (paths are parity-pinned)
    np.testing.assert_allclose(float(lf), float(ls), rtol=1e-5)
    for k in gf:
        a, b = np.asarray(gf[k]), np.asarray(gs[k])
        rel = np.max(np.abs(a - b) / (np.abs(b) + 1e-8))
        assert rel < 1e-5, f"{k}: fused-vs-staged grad rel err {rel}"


def test_tune_mpc_weights_runs_on_fused_tier():
    """tune_mpc_weights with use_fused_tick=True differentiates the fused
    multi-tick kernel end to end and returns finite, improving losses."""
    cfg = TuneConfig(iterations=2, learning_rate=0.1, settle_steps=2)
    result, tuned = tune_mpc_weights(
        _circle, _AD_STEPS, base_config=_AD_BASE, tune_cfg=cfg,
        loop_cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=2),
    )
    assert np.isfinite(float(result.final_loss))
    assert float(result.final_loss) <= float(result.initial_loss) + 1e-6
    assert isinstance(tuned.q_pos[0], float)


def test_plant_step_ad_forward_and_grad():
    """px4_plant_step_ad: forward == the raw plant kernel; backward == the
    staged RK4 twin's gradient (PID tuning on the fused plant path)."""
    from unmanned_aerial_vehicles_tpu.models.params import RigidBodyParams
    from unmanned_aerial_vehicles_tpu.models.px4_surrogate import (
        RateLoopParams,
        px4_rate_tracking_step,
    )
    from unmanned_aerial_vehicles_tpu.ops.plant_pallas import (
        px4_plant_step_fused,
    )
    from unmanned_aerial_vehicles_tpu.ops.tick_ad import px4_plant_step_ad

    body, rl = RigidBodyParams(), RateLoopParams()
    state = jnp.asarray(
        [0.3, -0.2, 3.0, 0.4, 0.1, -0.3, 0.05, -0.02, 0.3, 0.1, 0.0, -0.1],
        jnp.float32,
    )
    control = jnp.asarray([0.8, 0.1, -0.2, 0.05], jnp.float32)
    args = dict(
        mass=body.mass, gravity=body.gravity,
        k_drag_linear=body.k_drag_linear,
        taus=(rl.tau_roll, rl.tau_pitch, rl.tau_yaw),
        dt=0.02, substeps=2,
        thrust_gain=body.gravity / rl.hover_thrust_norm,
        interpret=True,
    )
    raw = px4_plant_step_fused(state, control, **args)
    ad = px4_plant_step_ad(state, control, **args)
    np.testing.assert_array_equal(np.asarray(raw), np.asarray(ad))

    def staged_loss(c):
        x = state
        for _ in range(2):
            x = px4_rate_tracking_step(x, c, body, rl, 0.01)
        return jnp.sum(x[0:6] ** 2)

    def ad_loss(c):
        return jnp.sum(px4_plant_step_ad(state, c, **args)[0:6] ** 2)

    ga = jax.jit(jax.grad(ad_loss))(control)
    gs = jax.jit(jax.grad(staged_loss))(control)
    np.testing.assert_allclose(
        np.asarray(ga), np.asarray(gs), rtol=2e-3, atol=1e-5
    )
