from .closed_loop import (
    FlightLoopConfig,
    mpc_flight_rollout,
    pid_flight_rollout,
)
from .compare import (
    TRAJECTORY_TYPES,
    comparison_summary,
    run_comparison,
    run_full_comparison,
)

__all__ = [
    "FlightLoopConfig",
    "mpc_flight_rollout",
    "pid_flight_rollout",
    "TRAJECTORY_TYPES",
    "comparison_summary",
    "run_comparison",
    "run_full_comparison",
]
