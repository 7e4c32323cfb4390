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
