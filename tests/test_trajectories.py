"""Trajectory-family tests: values vs reference formulas, vmap/jit safety,
finite-difference consistency of the analytic derivatives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unmanned_aerial_vehicles_tpu.trajectories import (
    TRAJECTORY_CONFIGS,
    available_trajectories,
    circular_trajectory,
    figure_8_trajectory,
    get_trajectory_function,
    ramped_figure8_reference,
)


def test_family_count():
    assert len(available_trajectories()) == 10
    assert len(TRAJECTORY_CONFIGS) == 15


def test_figure8_values():
    # trajectory_definitions.py:48-79 with defaults scale=3, period=20
    t = 5.0
    pos, vel, acc = figure_8_trajectory(t)
    w = 2 * np.pi / 20.0
    np.testing.assert_allclose(pos[0], 3.0 * np.sin(w * t), atol=1e-12)
    np.testing.assert_allclose(pos[1], 3.0 * np.sin(2 * w * t) / 2, atol=1e-12)
    np.testing.assert_allclose(pos[2], -2.0, atol=1e-12)
    np.testing.assert_allclose(vel[0], 3.0 * w * np.cos(w * t), atol=1e-12)


def test_circle_z_flip_quirk():
    # reference returns z = -center[2] for the circle (:103)
    pos, _, _ = circular_trajectory(0.0, center=(0.0, 0.0, -2.0))
    np.testing.assert_allclose(pos[2], 2.0, atol=1e-12)


@pytest.mark.parametrize("name", sorted(TRAJECTORY_CONFIGS))
def test_configs_jit_vmap(name):
    fn = get_trajectory_function(name)
    ts = jnp.linspace(0.0, 40.0, 64)
    pos, vel, acc = jax.jit(fn)(ts)
    assert pos.shape == vel.shape == acc.shape == (64, 3)
    assert bool(jnp.all(jnp.isfinite(pos)))
    assert bool(jnp.all(jnp.isfinite(vel)))


@pytest.mark.parametrize(
    "name", ["slow_figure8", "easy_circle", "oval_race", "sine_wave_x"]
)
def test_velocity_is_position_derivative(name):
    """Smooth families: analytic velocity matches central differences."""
    fn = get_trajectory_function(name)
    ts = jnp.linspace(1.0, 30.0, 200)
    h = 1e-5
    pos_p, _, _ = fn(ts + h)
    pos_m, _, _ = fn(ts - h)
    fd_vel = (pos_p - pos_m) / (2 * h)
    _, vel, _ = fn(ts)
    np.testing.assert_allclose(np.asarray(fd_vel), np.asarray(vel), atol=1e-6)


def test_ramped_figure8():
    # src/px4/mpc.py:1982-1994: A=6 default in flight config, tanh(t/5) ramp
    pos, yaw = ramped_figure8_reference(10.0, amplitude=6.0, frequency=0.02)
    w = 2 * np.pi * 0.02
    ramp = np.tanh(10.0 / 5.0)
    np.testing.assert_allclose(pos[0], ramp * 6.0 * np.sin(w * 10.0), atol=1e-12)
    np.testing.assert_allclose(pos[1], ramp * 3.0 * np.sin(2 * w * 10.0), atol=1e-12)
    np.testing.assert_allclose(yaw, 0.0)


def test_square_closes_loop():
    fn = get_trajectory_function("square_path")
    p0, _, _ = fn(0.0)
    p1, _, _ = fn(20.0)  # one full period
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-9)
