"""Direct PID-step parity vs a NumPy transcription of the reference's
``PIDController.update`` (cascade_pid_demo.py:25-84)."""

import jax.numpy as jnp
import numpy as np

from unmanned_aerial_vehicles_tpu.control import PIDGains, pid_init, pid_step


class NumpyPID:
    """Independent transcription of the reference semantics."""

    def __init__(self, kp, ki, kd, max_output, max_integral):
        self.kp, self.ki, self.kd = kp, ki, kd
        self.max_output, self.max_integral = max_output, max_integral
        self.previous_error = 0.0
        self.integral = 0.0
        self.initialized = False

    def update(self, setpoint, current, dt):
        if not self.initialized:
            self.initialized = True
            return 0.0
        error = setpoint - current
        self.integral = float(
            np.clip(self.integral + error * dt, -self.max_integral, self.max_integral)
        )
        derivative = (error - self.previous_error) / dt
        out = self.kp * error + self.ki * self.integral + self.kd * derivative
        out = float(np.clip(out, -self.max_output, self.max_output))
        self.previous_error = error
        return out


def test_pid_step_matches_reference_semantics(rng):
    gains = PIDGains(kp=0.8, ki=0.04, kd=0.12, max_output=2.0, max_integral=0.8)
    ref = NumpyPID(0.8, 0.04, 0.12, 2.0, 0.8)
    state = pid_init(dtype=jnp.float64)
    dt = 0.02

    setpoints = rng.normal(size=50) * 3.0
    currents = rng.normal(size=50) * 3.0
    for k in range(50):
        ours, state = pid_step(gains, state, setpoints[k], currents[k], dt)
        theirs = ref.update(setpoints[k], currents[k], dt)
        np.testing.assert_allclose(float(ours), theirs, atol=1e-12,
                                   err_msg=f"step {k}")


def test_pid_first_call_returns_zero():
    gains = PIDGains(kp=10.0)
    out, state = pid_step(gains, pid_init(), 5.0, 0.0, 0.02)
    assert float(out) == 0.0
    out2, _ = pid_step(gains, state, 5.0, 0.0, 0.02)
    assert float(out2) != 0.0


def test_pid_output_and_integral_clamps():
    gains = PIDGains(kp=100.0, ki=100.0, kd=0.0, max_output=1.0, max_integral=0.1)
    state = pid_init(dtype=jnp.float64)
    out, state = pid_step(gains, state, 10.0, 0.0, 0.02)  # init
    for _ in range(20):
        out, state = pid_step(gains, state, 10.0, 0.0, 0.02)
    assert abs(float(out)) <= 1.0
    assert abs(float(state.integral)) <= 0.1 + 1e-12


def test_pid_circle_campaign_beats_baseline():
    """Cascade-PID circle flight on the campaign-calibrated plant beats the
    reference campaign's RMS position error (2.524 m, max 2.759 m —
    bags/metrics_circle_1_PID.png). Calibration rationale lives on
    models.px4_surrogate.PID_CAMPAIGN_RATE_LOOP."""
    import jax

    from unmanned_aerial_vehicles_tpu.loop import FlightLoopConfig, pid_flight_rollout
    from unmanned_aerial_vehicles_tpu.models import PID_CAMPAIGN_RATE_LOOP
    from unmanned_aerial_vehicles_tpu.trajectories import ramped_circle_reference

    cfg = FlightLoopConfig()

    def ref(t):
        pos, _, yaw = ramped_circle_reference(t, amplitude=6.0,
                                              height=cfg.takeoff_height)
        return pos, yaw

    outs = jax.jit(
        lambda: pid_flight_rollout(
            ref, int(105.0 / cfg.control_dt), cfg=cfg,
            rate_loop=PID_CAMPAIGN_RATE_LOOP,
        )
    )()
    st = np.asarray(outs["state"])
    pr = np.asarray(outs["pos_ref"])
    err = np.linalg.norm(st[:, :3] - pr, axis=1)
    rms = float(np.sqrt((err**2).mean()))
    assert rms <= 2.524, f"PID circle RMS {rms:.3f} m vs baseline 2.524 m"
    assert float(err.max()) <= 2.759
    # the calibrated plant kills the altitude droop the round-1 run had
    z_rms = float(np.sqrt(((st[:, 2] - pr[:, 2]) ** 2).mean()))
    assert z_rms < 0.05
