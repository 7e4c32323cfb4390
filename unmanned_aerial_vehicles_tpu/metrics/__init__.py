from .tracking import (
    attitude_rmse_deg,
    max_position_error,
    rms_position_error,
    rms_velocity_error,
    thrust_saturation_pct,
    tracking_metrics,
)

__all__ = [
    "attitude_rmse_deg",
    "max_position_error",
    "rms_position_error",
    "rms_velocity_error",
    "thrust_saturation_pct",
    "tracking_metrics",
]
