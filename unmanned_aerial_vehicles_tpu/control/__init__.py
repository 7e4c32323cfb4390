from .pid import PIDGains, PIDState, pid_init, pid_step
from .cascade_pid import (
    CascadePidGains,
    CascadeState,
    cascade_init,
    cascade_pid_step,
    ComparisonPidParams,
    comparison_pid_init,
    comparison_pid_step,
)
from .allocation import (
    AttitudeLoopState,
    attitude_loop_init,
    geometric_control_allocation,
    with_hover_fallback,
    torque_to_px4_rates,
)
from .mpc_linear import (
    LinearMPCConfig,
    LinearMPC,
    MPCCarry,
)
from .mpc_sqp import QuadCost, SQPCarry, SQPConfig, SQPMPC
from .mpc_rigid import DirectRateMPC, LTVTrackingMPC, RigidBodyMPC
from .mpc_demo import AttitudeMPC, RK4DemoMPC
from .ilqr import ILQRRigidBodyMPC, ilqr_solve
from .mppi import MPPIConfig, MPPIController

__all__ = [
    "PIDGains",
    "PIDState",
    "pid_init",
    "pid_step",
    "CascadePidGains",
    "CascadeState",
    "cascade_init",
    "cascade_pid_step",
    "ComparisonPidParams",
    "comparison_pid_init",
    "comparison_pid_step",
    "AttitudeLoopState",
    "attitude_loop_init",
    "geometric_control_allocation",
    "with_hover_fallback",
    "torque_to_px4_rates",
    "LinearMPCConfig",
    "LinearMPC",
    "MPCCarry",
    "QuadCost",
    "SQPCarry",
    "SQPConfig",
    "SQPMPC",
    "DirectRateMPC",
    "LTVTrackingMPC",
    "RigidBodyMPC",
    "ILQRRigidBodyMPC",
    "MPPIConfig",
    "MPPIController",
    "ilqr_solve",
    "AttitudeMPC",
    "RK4DemoMPC",
]
