from .qp import (
    admm_box_qp,
    admm_box_qp_chol,
    condense_dynamics,
    condense_ltv,
    condense_ltv_doubling,
    kkt_residuals,
)
from .parallel_riccati import lqr_tracking_solve_parallel
from .riccati import LQRSolution, lqr_tracking_solve

__all__ = [
    "admm_box_qp",
    "lqr_tracking_solve_parallel",
    "admm_box_qp_chol",
    "condense_dynamics",
    "condense_ltv",
    "condense_ltv_doubling",
    "kkt_residuals",
    "LQRSolution",
    "lqr_tracking_solve",
]
