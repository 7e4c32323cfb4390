"""Mesh-sharded batch sweep: 64 closed-loop flights across all devices.

On CPU, set: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
"""

import jax
import jax.numpy as jnp

from unmanned_aerial_vehicles_tpu.control.mpc_linear import LinearMPC, LinearMPCConfig
from unmanned_aerial_vehicles_tpu.loop import FlightLoopConfig, mpc_flight_rollout
from unmanned_aerial_vehicles_tpu.parallel import make_mesh, sharded_flight_sweep
from unmanned_aerial_vehicles_tpu.trajectories import ramped_figure8_reference
from unmanned_aerial_vehicles_tpu.utils import scaled

cfg = FlightLoopConfig()
mpc = LinearMPC(LinearMPCConfig())


def reference(t):
    pos, yaw = ramped_figure8_reference(t)
    return pos + jnp.array([0.0, 0.0, cfg.takeoff_height]), yaw


def one_flight(x0):
    return mpc_flight_rollout(mpc, reference, scaled(1000, 128), cfg=cfg,
                              initial_state=x0)


B = scaled(64, 16)
starts = jnp.zeros((B, 12), jnp.float32).at[:, 2].set(cfg.takeoff_height)
starts = starts.at[:, 0].set(jnp.linspace(-2.0, 2.0, B))

mesh = make_mesh()
result = sharded_flight_sweep(mesh, one_flight, starts)
print(f"{B} flights on {len(jax.devices())} device(s): "
      f"rms mean {float(result['rms_mean']):.3f} m, "
      f"max {float(result['rms_max']):.3f} m")

# -- throughput mode with the fused GP posterior kernel ----------------------
# The structured batched controller kernel advances every flight in lockstep
# (one gridded Pallas dispatch per tick), and the GP residual stage runs
# through the limb-packed posterior-mean kernel: the (B*N, n_train) K_star
# matrix never leaves VMEM (on v5e this halves the per-tick cost vs the
# staged XLA GP — see artifacts/throughput_roofline.json for the analysis).
import numpy as np

from unmanned_aerial_vehicles_tpu.gp import fit_residual_gp
from unmanned_aerial_vehicles_tpu.gp.residual_gp import ResidualGPConfig
from unmanned_aerial_vehicles_tpu.parallel import sharded_structured_flight_sweep

gp_cfg = ResidualGPConfig()
rng = np.random.default_rng(0)
post = fit_residual_gp(
    jnp.asarray(rng.normal(size=(scaled(400, 64), 10)), jnp.float32),
    jnp.asarray(0.05 * rng.normal(size=(scaled(400, 64), 6)), jnp.float32),
    gp_cfg,
)
mpc_fused = LinearMPC(LinearMPCConfig(use_fused_controller=True))
result_k = sharded_structured_flight_sweep(
    mesh, mpc_fused, reference, scaled(500, 64), starts,
    gp_posterior=post, gp_cfg=gp_cfg, gp_fused_precision="high",
)
print(f"structured GP-MPC sweep (fused GP kernel): "
      f"rms mean {float(result_k['rms_mean']):.3f} m, "
      f"max {float(result_k['rms_max']):.3f} m")
