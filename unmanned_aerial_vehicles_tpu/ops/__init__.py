from .qp import condense_dynamics, admm_box_qp, kkt_residuals

__all__ = ["condense_dynamics", "admm_box_qp", "kkt_residuals"]
