from .exact_gp import (
    GPParams,
    GPPosterior,
    fit_gp,
    log_marginal_likelihood,
    optimize_hyperparameters,
    predict,
    predict_mean,
)
from .analysis import (
    analyze_gp_model,
    generate_generic_test_points,
    generate_physical_test_points,
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
    fit_residual_gp_masked,
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
    "analyze_gp_model",
    "generate_generic_test_points",
    "generate_physical_test_points",
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
    "fit_residual_gp_masked",
    "predict_residual",
]
