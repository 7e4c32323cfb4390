"""PX4-in-the-loop surrogate plant (rate-setpoint + normalized-thrust inputs).

The reference's flight controllers do not command torques — they publish
body-rate setpoints and a normalized thrust to PX4
(``/root/reference/src/px4/mpc.py:1966-1980``), whose internal rate controller
tracks them. For closed-loop runs to be comparable to the PX4 SITL campaign
(SURVEY.md section 6 / hard part (e)) the simulated plant must absorb that
inner loop. We model it the way the reference's direct-rate MPC models PX4
(``/root/reference/src/px4/mpc_direct_rates.py:150-220``): a first-order lag
on each body rate with time constants ``tau = (0.05, 0.05, 0.08)`` seconds,
on top of the rigid-body translational/attitude kinematics.

Thrust semantics: normalized thrust 1.0 == hover (acceleration g along the
body thrust axis), matching the reference allocation's
``thrust_magnitude / g`` normalisation (``mpc.py:2064``).

Frame convention — the reference's "mixed NED" frame: the flight nodes keep
PX4's NED x (north), y (east) and NED Euler angles/body rates, but flip z to
up (``mpc.py:1891-1892``). In that frame the thrust direction enters as

    a_xy = -(T/m) * (R(phi,theta,psi) e3)_xy,   a_z = +(T/m) * (R e3)_z - g

(PX4 thrust is along -z_body in NED). This is what makes the reference's
allocation signs (``pitch_cmd = -asin(t_x)``, ``roll_cmd = +asin(t_y)``,
``mpc.py:2070-2072``) and the cascade PID's ``pitch = -vel_x PID`` /
``roll = +vel_y PID`` (``cascade_pid_demo.py:394-395``) correct — so the
surrogate implements exactly these kinematics and the reference controllers
transfer verbatim.

State: the same 12-state layout as ``rigid_body.py`` (mixed-NED semantics).
Control: ``[thrust_normalized, p_cmd, q_cmd, r_cmd]``.
"""

from __future__ import annotations

from flax import struct
import jax
import jax.numpy as jnp

from ..utils.rotations import euler_rate_transform, euler_to_rotation_matrix
from .params import RigidBodyParams


@struct.dataclass
class RateLoopParams:
    """First-order body-rate tracking constants (``mpc_direct_rates.py:150-165``)
    plus the normalized-thrust calibration of the PX4 inner loop.

    ``hover_thrust_norm`` is the normalized thrust at which the plant hovers:
    thrust acceleration = ``thrust_norm * g / hover_thrust_norm``. It absorbs
    PX4's actuator normalization, which the recorded campaign pins
    *differently per run* (see ``PID_CAMPAIGN_RATE_LOOP``). Default 1.0
    matches the MPC allocation's ``|a_des + g e3| / g`` convention
    (``mpc.py:2064``), under which hover commands exactly 1.0.
    """

    tau_roll: float = 0.05
    tau_pitch: float = 0.05
    tau_yaw: float = 0.08
    hover_thrust_norm: float = 1.0

    @property
    def taus(self) -> jnp.ndarray:
        return jnp.asarray([self.tau_roll, self.tau_pitch, self.tau_yaw])


def _derivative(
    state: jnp.ndarray,
    control: jnp.ndarray,
    body: RigidBodyParams,
    rates: RateLoopParams,
) -> jnp.ndarray:
    vel = state[..., 3:6]
    phi, theta, psi = state[..., 6], state[..., 7], state[..., 8]
    omega = state[..., 9:12]

    thrust_norm = control[..., 0]
    rate_cmd = control[..., 1:4]

    R = euler_to_rotation_matrix(phi, theta, psi)
    # mixed-NED thrust mapping: xy components flip sign (see module docstring);
    # normalized hover_thrust_norm -> acceleration g along the thrust axis.
    t_dir = R[..., :, 2] * jnp.asarray([-1.0, -1.0, 1.0], state.dtype)
    thrust_gain = body.gravity / rates.hover_thrust_norm
    thrust_accel_world = t_dir * (thrust_norm * thrust_gain)[..., None]

    # drag acts on the airspeed (v - wind); zero wind = reference behaviour.
    airspeed_vec = vel - jnp.asarray(body.wind, state.dtype)
    # gradient-safe ||.||: exact forward value, zero (sub)gradient at 0 —
    # same guard as rigid_body.py; a plain norm's derivative is NaN at exact
    # hover, which poisons any autodiff through the plant (tuning.autotune
    # back-propagates whole flights through this step).
    sq = jnp.sum(airspeed_vec**2, axis=-1, keepdims=True)
    speed = jnp.where(sq > 0.0, jnp.sqrt(jnp.where(sq > 0.0, sq, 1.0)), 0.0)
    drag_accel = -(body.k_drag_linear / body.mass) * speed * airspeed_vec

    gravity = jnp.zeros_like(vel).at[..., 2].set(-body.gravity)
    acceleration = thrust_accel_world + gravity + drag_accel

    W = euler_rate_transform(phi, theta)
    attitude_dot = jnp.einsum("...ij,...j->...i", W, omega)

    taus = jnp.asarray(rates.taus, state.dtype)  # avoid x64 promotion
    omega_dot = (rate_cmd - omega) / taus

    return jnp.concatenate([vel, acceleration, attitude_dot, omega_dot], axis=-1)


# Calibration for reproducing the cascade-PID campaign runs: the PID node
# feeds a HOVER_THRUST = 0.7 baseline forward
# (``/root/reference/src/px4/cascade_pid_demo.py:405``) and its recorded bag
# holds altitude at 3.00 +- 0.05 m for the whole 105 s trajectory phase
# (``bags/pid_cascade_20251119_001928_comprehensive_analysis.png``) — i.e.
# that run's plant hovered at ~0.7 normalized thrust, or the vehicle would
# visibly droop/climb. (The MPC bags instead record thrust >= 0.99 at hover
# for 99.2 % of samples — the campaign's own normalization is inconsistent
# across runs, hence per-campaign calibration rather than one global value.)
PID_CAMPAIGN_RATE_LOOP = RateLoopParams(hover_thrust_norm=0.7)


def px4_rate_tracking_step(
    state: jnp.ndarray,
    control: jnp.ndarray,
    body: RigidBodyParams,
    rates: RateLoopParams,
    dt: float,
) -> jnp.ndarray:
    """RK4 step of the rate-tracking surrogate plant."""

    def f(x):
        return _derivative(x, control, body, rates)

    k1 = f(state)
    k2 = f(state + 0.5 * dt * k1)
    k3 = f(state + 0.5 * dt * k2)
    k4 = f(state + dt * k3)
    return state + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def derivative_jacobian(
    state: jnp.ndarray,
    control: jnp.ndarray,
    body: RigidBodyParams,
    rates: RateLoopParams,
) -> jnp.ndarray:
    """Hand-derived ``d(_derivative)/d(state)`` — the continuous-time process
    Jacobian of the surrogate, in closed form (no autodiff).

    Exists so the EKF's transition Jacobian can be evaluated PER TICK inside
    the fused Pallas kernel (``ops.tick_pallas``): the in-kernel filter
    previously froze a ``jacfwd`` F for a whole dispatch (the one
    approximation vs the staged ``estimation.ekf_step``); transcribing this
    closed form removes it. Structure (rows = derivative components):

    * position rows: ``d(pos_dot)/d(vel) = I``;
    * acceleration rows: drag Jacobian ``-(k/m)(speed I + av av'/speed)``
      wrt velocity (zero at zero airspeed, matching the gradient-safe
      guard), thrust-direction derivatives wrt the Euler angles;
    * attitude rows: ``dW/d(phi, theta) omega`` and ``W`` wrt rates;
    * rate rows: ``-diag(1/tau)`` (the rate-lag block — constant).

    Verified against ``jax.jacfwd`` of ``_derivative`` to f64 precision in
    ``tests/test_dynamics.py``.
    """
    dtype = state.dtype
    vel = state[3:6]
    phi, theta, psi = state[6], state[7], state[8]
    p, q, r = state[9], state[10], state[11]
    thrust_norm = control[0]

    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    cpsi, spsi = jnp.cos(psi), jnp.sin(psi)
    cth_safe = jnp.where(jnp.abs(cth) < 1e-6,
                         jnp.where(cth < 0, -1e-6, 1e-6), cth)
    tth = sth / cth_safe
    sec = 1.0 / cth_safe
    sec2 = sec * sec

    J = jnp.zeros((12, 12), dtype)
    # position rows
    J = J.at[0:3, 3:6].set(jnp.eye(3, dtype=dtype))

    # acceleration rows: drag wrt velocity
    av = vel - jnp.asarray(body.wind, dtype)
    sq = jnp.sum(av**2)
    speed = jnp.where(sq > 0.0, jnp.sqrt(jnp.where(sq > 0.0, sq, 1.0)), 0.0)
    kd = body.k_drag_linear / body.mass
    outer = jnp.where(
        sq > 0.0, jnp.outer(av, av) / jnp.where(sq > 0.0, speed, 1.0), 0.0
    )
    J = J.at[3:6, 3:6].set(-kd * (speed * jnp.eye(3, dtype=dtype) + outer))

    # acceleration rows: thrust direction wrt Euler angles
    a_thrust = thrust_norm * body.gravity / rates.hover_thrust_norm
    dt_dphi = jnp.stack([
        sphi * sth * cpsi - cphi * spsi,
        sphi * sth * spsi + cphi * cpsi,
        -sphi * cth,
    ])
    dt_dtheta = jnp.stack([
        -cphi * cth * cpsi,
        -cphi * cth * spsi,
        -cphi * sth,
    ])
    dt_dpsi = jnp.stack([
        cphi * sth * spsi - sphi * cpsi,
        -(cphi * sth * cpsi + sphi * spsi),
        jnp.zeros((), dtype),
    ])
    J = J.at[3:6, 6].set(a_thrust * dt_dphi)
    J = J.at[3:6, 7].set(a_thrust * dt_dtheta)
    J = J.at[3:6, 8].set(a_thrust * dt_dpsi)

    # attitude rows: W(phi, theta) omega
    J = J.at[6, 6].set(q * cphi * tth - r * sphi * tth)
    J = J.at[6, 7].set((q * sphi + r * cphi) * sec2)
    J = J.at[6, 9:12].set(jnp.stack([jnp.ones((), dtype), sphi * tth,
                                     cphi * tth]))
    J = J.at[7, 6].set(-q * sphi - r * cphi)
    J = J.at[7, 10].set(cphi)
    J = J.at[7, 11].set(-sphi)
    J = J.at[8, 6].set((q * cphi - r * sphi) * sec)
    J = J.at[8, 7].set((q * sphi + r * cphi) * sth * sec2)
    J = J.at[8, 10].set(sphi * sec)
    J = J.at[8, 11].set(cphi * sec)

    # rate rows: first-order lag
    taus = jnp.asarray(rates.taus, dtype)
    J = J.at[9:12, 9:12].set(jnp.diag(-1.0 / taus))
    return J


def px4_step_jacobian(
    state: jnp.ndarray,
    control: jnp.ndarray,
    body: RigidBodyParams,
    rates: RateLoopParams,
    dt: float,
) -> jnp.ndarray:
    """Analytic transition Jacobian of ``px4_rate_tracking_step`` — the
    exact chain rule through the RK4 stages using ``derivative_jacobian``:

        K1 = J(x),               K2 = J(x + h/2 k1)(I + h/2 K1),
        K3 = J(x + h/2 k2)(I + h/2 K2),  K4 = J(x + h k3)(I + h K3),
        F  = I + h/6 (K1 + 2 K2 + 2 K3 + K4).

    Mathematically identical to ``jax.jacfwd(px4_rate_tracking_step)``
    (same chain rule, evaluated in closed form); agreement is pinned in
    ``tests/test_dynamics.py``.
    """
    f = lambda x: _derivative(x, control, body, rates)
    Jat = lambda x: derivative_jacobian(x, control, body, rates)
    eye = jnp.eye(12, dtype=state.dtype)
    h = dt
    # HIGHEST: the chain-rule products otherwise run bf16 passes on TPU
    # (measured 1.5e-4 F error vs jacfwd); F feeds EKF covariance updates
    mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

    k1 = f(state)
    x2 = state + 0.5 * h * k1
    k2 = f(x2)
    x3 = state + 0.5 * h * k2
    k3 = f(x3)
    x4 = state + h * k3

    K1 = Jat(state)
    K2 = mm(Jat(x2), eye + 0.5 * h * K1)
    K3 = mm(Jat(x3), eye + 0.5 * h * K2)
    K4 = mm(Jat(x4), eye + h * K3)
    return eye + (h / 6.0) * (K1 + 2.0 * K2 + 2.0 * K3 + K4)
