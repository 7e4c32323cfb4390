"""State estimation (the PX4-EKF2 role, in-graph): 12-state EKF over the
surrogate dynamics + noisy-sensor closed loops."""

from .ekf import (
    EKFConfig,
    EKFState,
    MEASURED_IDX,
    ekf_init,
    ekf_step,
    measure,
)
from .noisy_loop import (
    noisy_ltv_rollout,
    noisy_mpc_flight_rollout,
    noisy_rigid_mpc_rollout,
)

__all__ = [
    "EKFConfig",
    "EKFState",
    "MEASURED_IDX",
    "ekf_init",
    "ekf_step",
    "measure",
    "noisy_ltv_rollout",
    "noisy_mpc_flight_rollout",
    "noisy_rigid_mpc_rollout",
]
