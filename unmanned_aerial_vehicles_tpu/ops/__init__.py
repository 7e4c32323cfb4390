from .qp import (
    admm_box_qp,
    admm_box_qp_chol,
    condense_dynamics,
    condense_ltv,
    kkt_residuals,
)
from .riccati import LQRSolution, lqr_tracking_solve

__all__ = [
    "admm_box_qp",
    "admm_box_qp_chol",
    "condense_dynamics",
    "condense_ltv",
    "kkt_residuals",
    "LQRSolution",
    "lqr_tracking_solve",
]
