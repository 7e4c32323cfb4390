"""GP model checkpointing (npz pytree snapshots).

Replaces the reference's three checkpoint formats — sklearn pickle
(``/root/reference/src/px4/train_gp_offline.py:186-214``), per-dimension
model+scaler pickles (``src/px4/gp_trainer.py:207-229``), and the npz of the
from-scratch GP (``quadrotor_gp_mpc/gaussian_process.py:369-394``) — with a
single npz layout holding the training set, hyperparameters and
normalisation stats. Refitting on load (one Cholesky) reproduces the
posterior exactly, mirroring ``gaussian_process.py:380-394``.
"""

from __future__ import annotations

import numpy as np

from ..gp.exact_gp import GPParams, GPPosterior, fit_gp


def save_gp_checkpoint(path: str, posterior: GPPosterior, X, Y, jitter: float,
                       normalize_y: bool = True, metadata: dict | None = None):
    arrays = {
        "X_train": np.asarray(X),
        "Y_train": np.asarray(Y),
        "log_length_scale": np.asarray(posterior.params.log_length_scale),
        "log_signal_variance": np.asarray(posterior.params.log_signal_variance),
        "log_noise_variance": np.asarray(posterior.params.log_noise_variance),
        "jitter": np.asarray(jitter),
        "normalize_y": np.asarray(normalize_y),
    }
    for k, v in (metadata or {}).items():
        arrays[f"meta_{k}"] = np.asarray(v)
    np.savez(path, **arrays)


def load_gp_checkpoint(path: str, dtype=None):
    """Returns ``(posterior, X, Y, jitter, normalize_y)`` with the posterior
    refitted (``normalize_y`` is surfaced so any capacity-capped REfit can
    reproduce the checkpoint's normalisation choice exactly)."""
    data = np.load(path)
    X = data["X_train"]
    Y = data["Y_train"]
    if dtype is not None:
        X, Y = X.astype(dtype), Y.astype(dtype)
    params = GPParams(
        log_length_scale=data["log_length_scale"],
        log_signal_variance=data["log_signal_variance"],
        log_noise_variance=data["log_noise_variance"],
    )
    jitter = float(data["jitter"])
    normalize_y = bool(data["normalize_y"])
    posterior = fit_gp(params, X, Y, jitter=jitter, normalize_y=normalize_y)
    return posterior, X, Y, jitter, normalize_y
