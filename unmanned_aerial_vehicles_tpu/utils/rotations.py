"""Rotation / attitude helpers (pure JAX, batch-friendly).

Semantics match the reference implementations so closed-loop numbers are
comparable: ZYX Euler rotation matrix and Euler-rate transform as in
``/root/reference/quadrotor_gp_mpc/quadrotor_gp_mpc/quadrotor_dynamics.py:98-146``,
quaternion conversions as in ``/root/reference/src/px4/mpc.py:1257-1295``,
angle wrapping as in ``/root/reference/src/px4/mpc.py:1297-1303``.

All functions are elementwise/broadcast over leading batch dimensions and are
safe under ``jit`` / ``vmap`` / ``grad``.
"""

from __future__ import annotations

import jax.numpy as jnp


def wrap_angle(angle: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle(s) to [-pi, pi). Branch-free equivalent of the reference's
    while-loop (``src/px4/mpc.py:1297-1303``)."""
    return (angle + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


def euler_to_rotation_matrix(phi, theta, psi) -> jnp.ndarray:
    """Body->world rotation matrix, ZYX convention (R = Rz @ Ry @ Rx).

    Matches ``quadrotor_dynamics.py:98-120`` / ``mpc_FULL.py:188-205``.
    Returns shape ``(..., 3, 3)`` given broadcastable angle arrays.
    """
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    cpsi, spsi = jnp.cos(psi), jnp.sin(psi)

    r00 = cth * cpsi
    r01 = sphi * sth * cpsi - cphi * spsi
    r02 = cphi * sth * cpsi + sphi * spsi
    r10 = cth * spsi
    r11 = sphi * sth * spsi + cphi * cpsi
    r12 = cphi * sth * spsi - sphi * cpsi
    r20 = -sth
    r21 = sphi * cth
    r22 = cphi * cth
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def euler_rate_transform(phi, theta) -> jnp.ndarray:
    """W(phi, theta): body rates [p,q,r] -> Euler-angle rates.

    Includes the reference's singularity guard ``|cos(theta)| >= 1e-6``
    (``quadrotor_dynamics.py:133-146``). Returns shape ``(..., 3, 3)``.
    """
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    cth = jnp.cos(theta)
    tth = jnp.tan(theta)

    # sign-preserving clamp away from the theta = +-pi/2 singularity
    cth_safe = jnp.where(
        jnp.abs(cth) < 1e-6, jnp.where(cth < 0.0, -1e-6, 1e-6), cth
    )

    one = jnp.ones_like(cphi)
    zero = jnp.zeros_like(cphi)
    return jnp.stack(
        [
            jnp.stack([one, sphi * tth, cphi * tth], axis=-1),
            jnp.stack([zero, cphi, -sphi], axis=-1),
            jnp.stack([zero, sphi / cth_safe, cphi / cth_safe], axis=-1),
        ],
        axis=-2,
    )


def euler_to_quaternion(roll, pitch, yaw) -> jnp.ndarray:
    """Euler (ZYX) -> quaternion [w, x, y, z]; ``mpc.py:1281-1295``."""
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)

    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return jnp.stack([w, x, y, z], axis=-1)


def quaternion_to_euler(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [w, x, y, z] -> Euler [roll, pitch, yaw].

    Matches ``mpc.py:1257-1279`` including the |sinp|>=1 pole clamp.
    ``q`` has shape ``(..., 4)``; returns ``(..., 3)``.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]

    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = 2.0 * (w * y - z * x)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1.0,
        jnp.sign(sinp) * (jnp.pi / 2.0),
        jnp.arcsin(jnp.clip(sinp, -1.0, 1.0)),
    )

    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return jnp.stack([roll, pitch, yaw], axis=-1)
