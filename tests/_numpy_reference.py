"""Independent NumPy re-implementations of the reference formulas.

These are transcriptions of the *math* (not the code) of
``/root/reference/quadrotor_gp_mpc/quadrotor_gp_mpc/quadrotor_dynamics.py``
and ``/root/reference/src/px4/simple_gp.py`` used as ground truth in parity
tests. Kept deliberately separate from the package so a bug in the JAX code
cannot hide in a shared helper.
"""

import numpy as np


def np_rotation_matrix(phi, theta, psi):
    cphi, sphi = np.cos(phi), np.sin(phi)
    cth, sth = np.cos(theta), np.sin(theta)
    cpsi, spsi = np.cos(psi), np.sin(psi)
    return np.array(
        [
            [cth * cpsi, sphi * sth * cpsi - cphi * spsi, cphi * sth * cpsi + sphi * spsi],
            [cth * spsi, sphi * sth * spsi + cphi * cpsi, cphi * sth * spsi - sphi * cpsi],
            [-sth, sphi * cth, cphi * cth],
        ]
    )


def np_angular_velocity_transform(phi, theta):
    cphi, sphi = np.cos(phi), np.sin(phi)
    cth = np.cos(theta)
    if abs(cth) < 1e-6:
        cth = 1e-6 * np.sign(cth) if cth != 0 else 1e-6
    return np.array(
        [
            [1, sphi * np.tan(theta), cphi * np.tan(theta)],
            [0, cphi, -sphi],
            [0, sphi / cth, cphi / cth],
        ]
    )


def np_rigid_body_derivative(
    state,
    control,
    mass=0.5,
    g=9.81,
    Ixx=0.0023,
    Iyy=0.0023,
    Izz=0.0046,
    k_drag_linear=0.25,
    k_drag_angular=0.01,
    residual=None,
):
    vx, vy, vz = state[3:6]
    phi, theta, psi = state[6:9]
    p, q, r = state[9:12]
    T = control[0]
    torques = np.asarray(control[1:4])

    pos_dot = state[3:6]
    R = np_rotation_matrix(phi, theta, psi)
    thrust_world = R @ np.array([0.0, 0.0, T])
    gravity = np.array([0.0, 0.0, -mass * g])
    velocity = np.array([vx, vy, vz])
    drag_force = -k_drag_linear * np.linalg.norm(velocity) * velocity
    acceleration = (thrust_world + gravity + drag_force) / mass

    W = np_angular_velocity_transform(phi, theta)
    attitude_dot = W @ np.array([p, q, r])

    omega = np.array([p, q, r])
    I = np.diag([Ixx, Iyy, Izz])
    gyroscopic = np.cross(omega, I @ omega)
    angular_drag = -k_drag_angular * omega
    angular_acceleration = np.linalg.inv(I) @ (torques - gyroscopic + angular_drag)

    out = np.concatenate([pos_dot, acceleration, attitude_dot, angular_acceleration])
    if residual is not None:
        out = out + residual
    return out


def np_rk4_step(state, control, dt, **kw):
    k1 = np_rigid_body_derivative(state, control, **kw)
    k2 = np_rigid_body_derivative(state + 0.5 * dt * k1, control, **kw)
    k3 = np_rigid_body_derivative(state + 0.5 * dt * k2, control, **kw)
    k4 = np_rigid_body_derivative(state + dt * k3, control, **kw)
    return state + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def np_nominal_double_integrator(state, control, dt):
    vx, vy, vz = state[3:6]
    ax, ay, az = control[0:3]
    state_dot = np.array([vx, vy, vz, ax, ay, az])
    return state + dt * state_dot
