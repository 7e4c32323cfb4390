from .exact_gp import (
    GPParams,
    GPPosterior,
    fit_gp,
    log_marginal_likelihood,
    optimize_hyperparameters,
    predict,
    predict_mean,
)
from .evaluate import evaluate_gp, evaluate_gp_residuals, write_metrics_csv
from .per_dim import (
    PerDimGP,
    Standardizer,
    default_per_dim_params,
    fit_per_dim_gp,
    per_dim_training_report,
    predict_per_dim,
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
    "evaluate_gp",
    "evaluate_gp_residuals",
    "write_metrics_csv",
    "PerDimGP",
    "Standardizer",
    "default_per_dim_params",
    "fit_per_dim_gp",
    "per_dim_training_report",
    "predict_per_dim",
    "ResidualDataset",
    "ResidualGPConfig",
    "add_training_sample",
    "build_horizon_residuals",
    "empty_dataset",
    "fit_residual_gp",
    "predict_residual",
]
