"""Online learning: fly, collect residual data and retrain the GP in-flight
— the whole mission is one compiled program."""

import jax
import jax.numpy as jnp
import numpy as np

from unmanned_aerial_vehicles_tpu.control.mpc_linear import LinearMPC, LinearMPCConfig
from unmanned_aerial_vehicles_tpu.gp.residual_gp import ResidualGPConfig
from unmanned_aerial_vehicles_tpu.loop import OnlineGPMPCConfig, online_gp_mpc_rollout
from unmanned_aerial_vehicles_tpu.trajectories import ramped_figure8_reference
from unmanned_aerial_vehicles_tpu.utils import scaled

cfg = OnlineGPMPCConfig(
    gp=ResidualGPConfig(max_data_points=400, residual_gain=1.0),
    gp_refit_every=scaled(250, 64),  # 5 s at 50 Hz (reference training timer)
)
mpc = LinearMPC(LinearMPCConfig())


def reference(t):
    pos, yaw = ramped_figure8_reference(t, amplitude=6.0, frequency=0.02)
    return pos + jnp.array([0.0, 0.0, cfg.flight.takeoff_height]), yaw


outs, dataset, posterior = jax.jit(
    lambda: online_gp_mpc_rollout(mpc, reference, scaled(3000, 200), cfg=cfg)
)()
err = np.linalg.norm(np.asarray(outs["pos_ref"] - outs["state"][:, 0:3]), axis=1)
print(f"samples collected in flight: {int(dataset.count)}")
print(f"fig-8 RMS with in-flight learning: {np.sqrt((err ** 2).mean()):.4f} m")
