"""Flight-node reference patterns with the 5-second tanh ramp.

These are the references actually flown in the PX4 campaign whose metrics form
the baseline table (BASELINE.md): the figure-8 of the MPC node
(``/root/reference/src/px4/mpc.py:1982-1994``) and the circle of the cascade
PID node (``/root/reference/src/px4/cascade_pid_demo.py:347-374``). Both apply
``ramp = tanh(max(t,0)/5)`` to the position — a reference quirk that shapes
the tracking numbers (SURVEY.md hard part (d)), so it is replicated exactly.

Velocity references additionally include the ramp-derivative term so rollouts
that track velocity see a consistent signal (the reference PID node computes
velocities without it — we keep its exact ``vx, vy`` formulas in
``ramped_circle_reference`` for parity, quirks included).
"""

from __future__ import annotations

import jax.numpy as jnp


def ramped_figure8_reference(t, amplitude: float = 6.0, frequency: float = 0.02):
    """Figure-8 position + yaw, ``src/px4/mpc.py:1982-1994``.

    Returns ``(pos(...,3), yaw)`` with z = 0 (altitude handled by the phase
    machine in the reference; closed-loop harnesses add their own altitude).
    """
    t = jnp.asarray(t)
    w = 2.0 * jnp.pi * frequency
    ramp = jnp.tanh(jnp.maximum(t, 0.0) / 5.0)
    x = ramp * amplitude * jnp.sin(w * t)
    y = ramp * (amplitude / 2.0) * jnp.sin(2.0 * w * t)
    z = jnp.zeros_like(x)
    yaw = jnp.zeros_like(x)
    return jnp.stack([x, y, z], axis=-1), yaw


def ramped_circle_reference(
    t, amplitude: float = 6.0, frequency: float = 0.02, height: float = 3.0
):
    """Circle position/velocity + yaw, ``cascade_pid_demo.py:347-374``.

    Returns ``(pos, vel, yaw)``. The velocity formulas reproduce the
    reference's (including its ``vy = A w cos(2 w t)`` quirk at :367).
    """
    t = jnp.asarray(t)
    w = 2.0 * jnp.pi * frequency
    ramp = jnp.tanh(jnp.maximum(t, 0.0) / 5.0)
    x = ramp * amplitude * jnp.sin(w * t)
    y = ramp * amplitude * jnp.cos(w * t)
    z = jnp.full_like(x, height)
    vx = ramp * amplitude * w * jnp.cos(w * t)
    vy = ramp * amplitude * w * jnp.cos(2.0 * w * t)
    vz = jnp.zeros_like(x)
    yaw = jnp.zeros_like(x)
    return (
        jnp.stack([x, y, z], axis=-1),
        jnp.stack([vx, vy, vz], axis=-1),
        yaw,
    )
