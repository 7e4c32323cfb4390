from .datasets import CSV_HEADER, load_gp_dataset, load_gp_datasets, save_gp_dataset
from .checkpoint import load_gp_checkpoint, save_gp_checkpoint

__all__ = [
    "CSV_HEADER",
    "load_gp_dataset",
    "load_gp_datasets",
    "save_gp_dataset",
    "load_gp_checkpoint",
    "save_gp_checkpoint",
]
