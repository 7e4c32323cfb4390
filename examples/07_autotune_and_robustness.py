"""Differentiable auto-tuning + Monte-Carlo robustness (capabilities the
reference lacks — its gains are hand-tuned, cascade_pid_demo.py:194-210,
and every run uses one nominal plant).

1. Gradient-descend the 27 cascade-PID gains THROUGH a whole closed-loop
   flight (controller + allocation + plant differentiated end-to-end).
2. Stress-test tuned vs hand-tuned gains over 128 randomized plants
   (mass/drag/rate-lag jitter + steady wind + perturbed starts).
"""

import jax

from unmanned_aerial_vehicles_tpu.loop import (
    MonteCarloConfig,
    monte_carlo_pid,
    pid_flight_rollout,
)
from unmanned_aerial_vehicles_tpu.trajectories import ramped_circle_reference
from unmanned_aerial_vehicles_tpu.tuning import TuneConfig, tune_cascade_gains
from unmanned_aerial_vehicles_tpu.utils import scaled


def reference(t):
    pos, _, yaw = ramped_circle_reference(t, amplitude=2.0, height=3.0)
    return pos, yaw


STEPS = scaled(1500, 200)  # 30 s at 50 Hz

# --- 1. tune -----------------------------------------------------------
result = tune_cascade_gains(
    reference, STEPS,
    tune_cfg=TuneConfig(iterations=scaled(30, 3), learning_rate=0.06),
)
print(f"tuning loss: {float(result.initial_loss):.4f} -> "
      f"{float(result.final_loss):.4f} over 30 gradient steps")

import numpy as np


def rms(outs):
    err = np.linalg.norm(
        np.asarray(outs["state"][:, 0:3]) - np.asarray(outs["pos_ref"]), axis=1
    )
    return float(np.sqrt((err ** 2).mean()))


base = jax.jit(lambda: pid_flight_rollout(reference, STEPS))()
tuned = jax.jit(lambda: pid_flight_rollout(reference, STEPS,
                                           gains=result.params))()
print(f"circle RMS: hand-tuned {rms(base):.3f} m -> auto-tuned "
      f"{rms(tuned):.3f} m")

# --- 2. robustness -----------------------------------------------------
mc = MonteCarloConfig(n_rollouts=scaled(128, 16), wind_std=0.8)
for name, gains in (("hand-tuned", None), ("auto-tuned", result.params)):
    stats = jax.jit(
        lambda g=gains: monte_carlo_pid(reference, STEPS, mc=mc, gains=g)
    )()
    print(f"{name}: success {float(stats['success_rate']) * 100:.1f} %, "
          f"RMS p50/p90/p99 = {float(stats['rms_p50']):.3f} / "
          f"{float(stats['rms_p90']):.3f} / {float(stats['rms_p99']):.3f} m")
