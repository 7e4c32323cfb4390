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
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicated_sharding",
    "shard_batch",
    "SweepResult",
    "hyperparameter_search_step",
    "sharded_flight_sweep",
]
