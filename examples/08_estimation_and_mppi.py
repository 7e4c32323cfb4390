"""Estimator-in-the-loop flight + derivative-free MPPI control.

Two capabilities the reference lacks: it consumes PX4-EKF2 state over DDS
(never running an estimator itself), and every controller it has is
derivative-based. Here: (1) a full sensors -> EKF -> GP-MPC -> plant loop,
(2) the same task flown by MPPI — 512 perturbed nonlinear rollouts per
tick, vmapped.
"""

import jax
import jax.numpy as jnp
import numpy as np

from unmanned_aerial_vehicles_tpu.control import MPPIConfig, MPPIController
from unmanned_aerial_vehicles_tpu.control.mpc_linear import LinearMPC, LinearMPCConfig
from unmanned_aerial_vehicles_tpu.estimation import noisy_mpc_flight_rollout
from unmanned_aerial_vehicles_tpu.loop import mpc_flight_rollout
from unmanned_aerial_vehicles_tpu.models import X500_PARAMS, rigid_body_rk4_step
from unmanned_aerial_vehicles_tpu.trajectories import ramped_circle_reference
from unmanned_aerial_vehicles_tpu.utils import scaled


def reference(t):
    pos, _, yaw = ramped_circle_reference(t, amplitude=2.0, height=3.0)
    return pos, yaw


def rms(pos, ref, skip=100):
    err = np.linalg.norm(np.asarray(pos) - np.asarray(ref), axis=1)
    return float(np.sqrt((err[skip:] ** 2).mean()))


STEPS = scaled(1000, 128)  # 20 s

# --- 1. EKF in the loop ------------------------------------------------
mpc = LinearMPC(LinearMPCConfig())
ideal = jax.jit(lambda: mpc_flight_rollout(mpc, reference, STEPS))()
noisy = jax.jit(
    lambda: noisy_mpc_flight_rollout(
        mpc, reference, STEPS, jax.random.PRNGKey(0)
    )
)()
print(f"MPC circle RMS: true state {rms(ideal['state'][:, 0:3], ideal['pos_ref']):.3f} m, "
      f"EKF-estimated state {rms(noisy['state'][:, 0:3], noisy['pos_ref']):.3f} m")
est_err = np.linalg.norm(
    np.asarray(noisy["state_est"][:, 0:3] - noisy["state"][:, 0:3]), axis=1
)
print(f"EKF position error: {est_err[100:].mean() * 100:.1f} cm mean "
      f"(sensors at 5 cm std)")

# --- 2. MPPI -----------------------------------------------------------
ctrl = MPPIController(MPPIConfig(num_samples=scaled(512, 64)))
dt = ctrl.config.dt


@jax.jit
def fly_mppi():
    x0 = jnp.zeros(12, jnp.float32).at[2].set(3.0)

    def step(c, i):
        st, mc = c
        pos_ref, yaw_ref = reference(i.astype(jnp.float32) * dt)
        u, _, mc = ctrl.solve(mc, st, pos_ref, yaw_ref)
        st = rigid_body_rk4_step(st, u, X500_PARAMS, dt)
        return (st, mc), {"state": st, "pos_ref": pos_ref}

    _, outs = jax.lax.scan(step, (x0, ctrl.init_carry(x0)), jnp.arange(STEPS))
    return outs


outs = fly_mppi()
print(f"MPPI ({ctrl.config.num_samples} rollouts/tick) circle RMS: "
      f"{rms(outs['state'][:, 0:3], outs['pos_ref']):.3f} m")
