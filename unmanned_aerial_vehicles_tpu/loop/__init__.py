from .closed_loop import (
    FlightLoopConfig,
    FlightResumeState,
    OnlineFusedGPConfig,
    mpc_flight_rollout,
    pid_flight_rollout,
)
from .full_system import OnlineGPMPCConfig, online_gp_mpc_rollout
from .mission import mission_rollout
from .monte_carlo import (
    MonteCarloConfig,
    monte_carlo_flights,
    monte_carlo_mpc,
    monte_carlo_mpc12,
    monte_carlo_pid,
    robustness_stats,
    sample_conditions,
)
from .compare import (
    TRAJECTORY_TYPES,
    comparison_summary,
    run_comparison,
    run_full_comparison,
)

__all__ = [
    "FlightLoopConfig",
    "FlightResumeState",
    "OnlineFusedGPConfig",
    "mpc_flight_rollout",
    "pid_flight_rollout",
    "OnlineGPMPCConfig",
    "online_gp_mpc_rollout",
    "mission_rollout",
    "MonteCarloConfig",
    "monte_carlo_flights",
    "monte_carlo_mpc",
    "monte_carlo_mpc12",
    "monte_carlo_pid",
    "robustness_stats",
    "sample_conditions",
    "TRAJECTORY_TYPES",
    "comparison_summary",
    "run_comparison",
    "run_full_comparison",
]
