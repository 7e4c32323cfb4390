"""The 12-state torque family end to end: fused whole-tick kernel + EKF.

Two round-5 capabilities for the reference's full 12-state formulation
(``src/px4/mpc_FULL.py:86-549``). (1) ``rigid_multitick_fused``: the
torque-SQP engine's per-tick chain — warm-start shift, condensed ADMM,
RK4 rigid-body plant — runs as ONE Pallas dispatch of K ticks (the
direct-rate multitick kernel with its in-kernel plant swapped via the
shared ``make_plant_math``); measured ~6.4 us/tick at K=20 on v5e vs
~50 staged, RMS identical. (2) ``noisy_rigid_mpc_rollout``: the
estimator joins the 12-state loop — noisy sensors -> rigid-body EKF
(pluggable process model, ``ekf_step(step_fn=...)``) -> controller
flying the ESTIMATE -> true plant. The reference always flew PX4-EKF2's
output; here the whole chain is one ``lax.scan`` and the
estimator-induced tracking cost is measurable (~1e-3 m on this task).
"""

import jax
import jax.numpy as jnp
import numpy as np

from unmanned_aerial_vehicles_tpu.control.mpc_rigid import RigidBodyMPC
from unmanned_aerial_vehicles_tpu.estimation import EKFConfig
from unmanned_aerial_vehicles_tpu.estimation.noisy_loop import (
    noisy_rigid_mpc_rollout,
)
from unmanned_aerial_vehicles_tpu.loop.rigid_loop import (
    rigid_multitick_fused,
    sqp_multitick_rollout,
)
from unmanned_aerial_vehicles_tpu.models import X500_PARAMS, rigid_body_rk4_step
from unmanned_aerial_vehicles_tpu.trajectories import ramped_circle_reference
from unmanned_aerial_vehicles_tpu.utils import scaled

DT = 0.02
HEIGHT = 3.0


def reference(t):
    pos, _, yaw = ramped_circle_reference(t, amplitude=2.0, height=HEIGHT)
    return pos, yaw


eng = RigidBodyMPC()
N = eng.mpc.config.horizon


def reference_fn(ticks):
    ts = ticks.astype(jnp.float32) * DT
    pos, _, _ = jax.vmap(
        lambda t: ramped_circle_reference(t, amplitude=2.0, height=HEIGHT)
    )(ts)
    stage = jnp.concatenate([pos, jnp.zeros((ts.shape[0], 9))], axis=1)
    return jnp.tile(stage[:, None, :], (1, N, 1))


def rms_vs_ref(states):
    ts = np.arange(states.shape[0]) * DT
    refs = np.stack([
        np.asarray(ramped_circle_reference(t, amplitude=2.0,
                                           height=HEIGHT)[0]) for t in ts
    ])
    return float(np.sqrt(np.mean(np.sum(
        (np.asarray(states[:, 0:3]) - refs) ** 2, -1))))


# --- 1. fused whole-tick tier vs the staged multitick -------------------
STEPS = scaled(480, 40)
K, ITERS = scaled(20, 4), scaled(10, 10)
x0 = jnp.zeros(12, jnp.float32).at[2].set(HEIGHT)
plant = lambda x, u: rigid_body_rk4_step(x, u, X500_PARAMS, DT)

staged = jax.jit(lambda: sqp_multitick_rollout(
    eng.mpc, eng.cost, reference_fn, plant, x0, STEPS,
    ticks_per_dispatch=K, admm_iterations=ITERS, u_init=eng.u_hover,
    plan_roll="linear"))()
fused = jax.jit(lambda: rigid_multitick_fused(
    eng.mpc, eng.cost, reference_fn, x0, STEPS,
    ticks_per_dispatch=K, admm_iterations=ITERS, u_init=eng.u_hover,
    dt=DT, plan_roll="linear"))()
print(
    f"torque-SQP multitick (K={K}, {ITERS} ADMM iters, {STEPS} ticks): "
    f"staged RMS {rms_vs_ref(staged['state']):.4f} m, "
    f"fused-kernel RMS {rms_vs_ref(fused['state']):.4f} m "
    f"(~6.4 us/tick on v5e at K=20, "
    f"artifacts/controller_latency.json sqp_mpc12_multitick_fused_k20_i10)"
)

# --- 2. the estimator joins the 12-state loop ---------------------------
NOISY_STEPS = scaled(480, 40)
outs = jax.jit(lambda: noisy_rigid_mpc_rollout(
    eng, reference, NOISY_STEPS, jax.random.PRNGKey(0),
    ekf_cfg=EKFConfig(), dt=DT, takeoff_height=HEIGHT))()
st = np.asarray(outs["state"])
est = np.asarray(outs["state_est"])
meas = np.asarray(outs["meas_pos"])
skip = scaled(40, 8)
est_err = float(np.sqrt(np.mean(np.sum(
    (est[skip:, 0:3] - st[skip:, 0:3]) ** 2, -1))))
meas_err = float(np.sqrt(np.mean(np.sum(
    (meas[skip:] - st[skip:, 0:3]) ** 2, -1))))
print(
    f"noisy 12-state loop ({NOISY_STEPS} ticks): tracking RMS "
    f"{rms_vs_ref(outs['state']):.4f} m; EKF position estimate "
    f"{est_err * 100:.1f} cm vs raw sensor {meas_err * 100:.1f} cm "
    f"(unmeasured velocity reconstructed by the filter)"
)
