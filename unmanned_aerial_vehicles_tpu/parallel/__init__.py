from .distributed_gp import (
    PerDimShardedGP,
    ShardedGPPosterior,
    fit_per_dim_gp_sharded,
    predict_per_dim_sharded,
    fit_residual_gp_sharded,
    lml_grad_sharded,
    optimize_hyperparameters_sharded,
    predict_mean_sharded,
    predict_sharded,
)
from .sharding import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from .sweep import (
    SweepResult,
    hyperparameter_search_step,
    sharded_flight_sweep,
    sharded_structured_flight_sweep,
)

__all__ = [
    "PerDimShardedGP",
    "ShardedGPPosterior",
    "fit_per_dim_gp_sharded",
    "predict_per_dim_sharded",
    "fit_residual_gp_sharded",
    "lml_grad_sharded",
    "optimize_hyperparameters_sharded",
    "predict_mean_sharded",
    "predict_sharded",
    "batch_sharding",
    "make_mesh",
    "replicated_sharding",
    "shard_batch",
    "SweepResult",
    "hyperparameter_search_step",
    "sharded_flight_sweep",
    "sharded_structured_flight_sweep",
]
