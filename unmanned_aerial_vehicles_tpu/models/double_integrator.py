"""6-state double-integrator plant (the linear-MPC nominal model).

State ``[x, y, z, vx, vy, vz]``, control ``[ax, ay, az, yaw_rate]``.
The yaw-rate channel does not enter the translational dynamics; it is kept in
the control vector for API parity with the reference controller
(``/root/reference/src/px4/mpc.py:1352-1368``).

The Euler discretisation matches ``SimpleQuadrotorGP._nominal_dynamics``
(``/root/reference/src/px4/simple_gp.py:147-154``) bit-for-bit in f64 —
that function defines the "nominal" model the residual GP learns against, so
the two implementations must agree exactly for residual parity.

Everything is broadcast over leading batch dims; no Python control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

STATE_DIM = 6
CONTROL_DIM = 4


def double_integrator_derivative(state: jnp.ndarray, control: jnp.ndarray) -> jnp.ndarray:
    """dx/dt = [vx, vy, vz, ax, ay, az] (``simple_gp.py:152-153``)."""
    return jnp.concatenate([state[..., 3:6], control[..., 0:3]], axis=-1)


def double_integrator_step(
    state: jnp.ndarray, control: jnp.ndarray, dt: float
) -> jnp.ndarray:
    """Forward-Euler step: ``x + dt * dx/dt`` (``simple_gp.py:154``)."""
    return state + dt * double_integrator_derivative(state, control)


def discrete_system_matrices(dt: float, dtype=jnp.float32):
    """(A, B) of the exact-Euler discrete LTI system used by the linear MPC.

    ``x_{k+1} = A x_k + B u_k`` with A = I + dt*[[0,I],[0,0]] and
    B = dt*[[0],[I],[0-col]] — the yaw-rate column of B is zero because the
    reference dynamics (``mpc.py:1359-1368``) ignore it.
    """
    A = jnp.eye(STATE_DIM, dtype=dtype)
    A = A.at[0:3, 3:6].set(dt * jnp.eye(3, dtype=dtype))
    B = jnp.zeros((STATE_DIM, CONTROL_DIM), dtype=dtype)
    B = B.at[3:6, 0:3].set(dt * jnp.eye(3, dtype=dtype))
    return A, B
