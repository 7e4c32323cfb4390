from .closed_loop import (
    FlightLoopConfig,
    mpc_flight_rollout,
    pid_flight_rollout,
)

__all__ = [
    "FlightLoopConfig",
    "mpc_flight_rollout",
    "pid_flight_rollout",
]
