"""State estimation (the PX4-EKF2 role, in-graph): 12-state EKF over the
surrogate dynamics, the 15-state disturbance observer, and noisy-sensor
closed loops."""

from .disturbance import (
    DisturbanceEKFConfig,
    DisturbanceEKFState,
    dekf_init,
    dekf_step,
    disturbance_residual_rows,
    disturbance_residual_rows12,
)
from .ekf import (
    EKFConfig,
    EKFState,
    MEASURED_IDX,
    ekf_init,
    ekf_step,
    joseph_update,
    measure,
)
from .noisy_loop import (
    noisy_ltv_rollout,
    noisy_mpc_flight_rollout,
    noisy_rigid_mpc_rollout,
)

__all__ = [
    "DisturbanceEKFConfig",
    "DisturbanceEKFState",
    "EKFConfig",
    "EKFState",
    "MEASURED_IDX",
    "dekf_init",
    "dekf_step",
    "disturbance_residual_rows",
    "disturbance_residual_rows12",
    "ekf_init",
    "ekf_step",
    "joseph_update",
    "measure",
    "noisy_ltv_rollout",
    "noisy_mpc_flight_rollout",
    "noisy_rigid_mpc_rollout",
]
