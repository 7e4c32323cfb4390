"""Throughput mode and the bf16-limb precision tiers.

The structured batched controller kernel advances B flights in lockstep
(one gridded Pallas dispatch per tick), and the GP residual stage runs
through the fused limb-packed posterior-mean kernel
(``ops.rbf_pallas.rbf_posterior_mean_pallas``): the (B*N, n_train) K_star
matrix never leaves VMEM (on v5e its HBM round trip was 62% of the round-3
tick), and the WHOLE squared distance is evaluated by a single-pass bf16
MXU dot whose dead K lanes carry bf16 compensation limbs.

The precision tiers demonstrate the trade this buys on real flight data
(against an f64 ground truth):

* ``highest`` — 6 limb products, ~2^-25: measured MORE accurate than the
  staged f32-HIGHEST XLA path (whose sq1 + sq2 - 2 cross cancels
  catastrophically at ||z||^2 ~ hundreds), at single-pass cost;
* ``high``    — 3 products, f32-class accuracy, the sweep default;
* ``default`` — plain single-limb bf16, the fastest tier.

`artifacts/throughput_roofline.json` (tools/roofline_throughput.py) holds
the measured machine ceilings and per-stage floors behind these numbers.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from unmanned_aerial_vehicles_tpu.control.mpc_linear import LinearMPC, LinearMPCConfig
from unmanned_aerial_vehicles_tpu.gp import build_horizon_residuals, fit_residual_gp
from unmanned_aerial_vehicles_tpu.gp.exact_gp import predict_mean
from unmanned_aerial_vehicles_tpu.gp.residual_gp import ResidualGPConfig
from unmanned_aerial_vehicles_tpu.loop.closed_loop import (
    FlightLoopConfig,
    batched_mpc_flight_sweep,
)
from unmanned_aerial_vehicles_tpu.ops.rbf_pallas import rbf_posterior_mean_pallas
from unmanned_aerial_vehicles_tpu.trajectories import ramped_figure8_reference
from unmanned_aerial_vehicles_tpu.utils import scaled

# ---- fit a flight-data-scale GP --------------------------------------------
gp_cfg = ResidualGPConfig()
rng = np.random.default_rng(0)
P = scaled(800, 120)
# realistic feature magnitudes (positions +-6 m, z ~ 3.4): the accuracy
# story below depends on ||z||^2 being large, as it is on real flight CSVs
X = jnp.asarray(
    rng.normal(size=(P, 10)) * np.array([6, 6, 0.3, 1, 1, 0.3, 1, 1, 0.5, 0.1])
    + np.array([0, 0, 3.4, 0, 0, 0, 0, 0, -2, 0]),
    jnp.float32,
)
Y = jnp.asarray(0.05 * rng.normal(size=(P, 6)), jnp.float32)
post = fit_residual_gp(X, Y, gp_cfg)

# ---- precision tiers vs f64 ground truth ------------------------------------
Xt = X[: scaled(512, 64)] + 0.01
Z64 = np.asarray(X, np.float64) / 0.5
Zt64 = np.asarray(Xt, np.float64) / 0.5
d2 = ((Zt64[:, None, :] - Z64[None, :, :]) ** 2).sum(-1)
tru = (
    np.exp(-0.5 * d2) @ np.asarray(post.alpha, np.float64)
    * np.asarray(post.y_std, np.float64)
    + np.asarray(post.y_mean, np.float64)
)
interpret = jax.default_backend() == "cpu"
staged_err = np.abs(np.asarray(jax.jit(predict_mean)(post, Xt), np.float64) - tru).max()
print(f"staged XLA f32-HIGHEST posterior mean vs f64: max err {staged_err:.2e}")
for prec in ("highest", "high", "default"):
    got = rbf_posterior_mean_pallas(post, Xt, precision=prec, interpret=interpret)
    err = np.abs(np.asarray(got, np.float64) - tru).max()
    print(f"fused limb-packed kernel [{prec:8s}]     : max err {err:.2e}")

# ---- the 1024-flight sweep -------------------------------------------------
B, T = scaled(1024, 128), scaled(500, 40)
mpc = LinearMPC(LinearMPCConfig(horizon=scaled(20, 10), admm_iterations=10,
                                use_fused_controller=True))
cfg = FlightLoopConfig()


def reference(t):
    pos, yaw = ramped_figure8_reference(t, amplitude=6.0, frequency=0.02)
    return pos + jnp.array([0.0, 0.0, cfg.takeoff_height]), yaw


starts = jnp.zeros((B, 12), jnp.float32).at[:, 2].set(cfg.takeoff_height)
starts = starts.at[:, 0].set(jnp.linspace(-1.0, 1.0, B))


@jax.jit
def sweep(ss):
    outs = batched_mpc_flight_sweep(
        mpc, reference, T, ss, cfg=cfg,
        gp_posterior=post, gp_cfg=gp_cfg, gp_fused_precision="high",
    )
    err = outs["pos_ref"][:, None, :] - outs["state"][:, :, 0:3]
    return jnp.sqrt(jnp.mean(jnp.sum(err**2, axis=-1), axis=0))


rms = sweep(starts)
float(rms[0])  # compile + sync
t0 = time.perf_counter()
rms = sweep(starts.at[:, 1].set(0.01))
float(rms[0])
dt_run = time.perf_counter() - t0
print(f"\n{B} concurrent GP-MPC flights x {T} ticks: "
      f"{dt_run / (B * T) * 1e6:.3f} us/tick/flight "
      f"(single timed call — includes the fixed dispatch overhead; "
      f"bench.py slope-measures it away)")
print(f"mean RMS over flights: {float(jnp.mean(rms)):.3f} m")
