from .exact_gp import (
    GPParams,
    GPPosterior,
    fit_gp,
    log_marginal_likelihood,
    optimize_hyperparameters,
    predict,
    predict_mean,
)
from .residual_gp import (
    ResidualDataset,
    ResidualGPConfig,
    add_training_sample,
    build_horizon_residuals,
    empty_dataset,
    fit_residual_gp,
    predict_residual,
)

__all__ = [
    "GPParams",
    "GPPosterior",
    "fit_gp",
    "log_marginal_likelihood",
    "optimize_hyperparameters",
    "predict",
    "predict_mean",
    "ResidualDataset",
    "ResidualGPConfig",
    "add_training_sample",
    "build_horizon_residuals",
    "empty_dataset",
    "fit_residual_gp",
    "predict_residual",
]
