"""Reference sklearn-pickle ingestion (io.sklearn_import).

Round-trips BOTH reference checkpoint formats through actual sklearn
objects: models are fitted and pickled exactly the way the reference writes
them (train_gp_offline.py:186-214 single-GP dict; gp_trainer.py:207-229
per-dim package), then loaded into this framework's posteriors and checked
against sklearn's own predictions to the 1e-6 parity bar.
"""

import pickle

import jax.numpy as jnp
import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")

from sklearn.gaussian_process import GaussianProcessRegressor  # noqa: E402
from sklearn.gaussian_process.kernels import (  # noqa: E402
    RBF,
    ConstantKernel,
    WhiteKernel,
)
from sklearn.preprocessing import StandardScaler  # noqa: E402

from unmanned_aerial_vehicles_tpu.gp.exact_gp import predict  # noqa: E402
from unmanned_aerial_vehicles_tpu.gp.per_dim import predict_per_dim  # noqa: E402
from unmanned_aerial_vehicles_tpu.io import (  # noqa: E402
    load_reference_gp,
    load_sklearn_gp_pickle,
    load_sklearn_perdim_pickle,
)


def _single_pickle(tmp_path, rng, optimizer=None):
    """The train_gp_offline.py format: RBF(0.5)+White(0.1), alpha=1e-4,
    normalize_y=True (simple_gp.py:156-177 configuration)."""
    X = rng.normal(size=(60, 10))
    Y = 0.1 * rng.normal(size=(60, 6)) + 0.03 * X[:, :6]
    gpr = GaussianProcessRegressor(
        kernel=RBF(length_scale=0.5) + WhiteKernel(noise_level=0.1),
        alpha=1e-4,
        normalize_y=True,
        optimizer=optimizer,
    )
    gpr.fit(X, Y)
    path = tmp_path / "gp_model.pkl"
    with open(path, "wb") as f:
        pickle.dump(
            {
                "gp_model": gpr,
                "training_count": 3,
                "data_points_used": len(X),
                "timestamp": "2026-08-17T00:00:00",
                "is_trained": True,
            },
            f,
        )
    return str(path), gpr, X


def test_single_pickle_parity(tmp_path, rng):
    path, gpr, X = _single_pickle(tmp_path, rng)
    post, meta = load_sklearn_gp_pickle(path)
    assert meta["is_trained"] and meta["training_count"] == 3

    Xq = rng.normal(size=(20, 10))
    mean_ref, std_ref = gpr.predict(Xq, return_std=True)
    mean, var = predict(post, jnp.asarray(Xq))
    np.testing.assert_allclose(np.asarray(mean), mean_ref, atol=1e-6)
    np.testing.assert_allclose(
        np.sqrt(np.asarray(var)), std_ref, atol=1e-6
    )


def test_single_pickle_optimized_kernel(tmp_path, rng):
    """sklearn's internal L-BFGS moves the hyperparameters during fit; the
    loader must read them off kernel_ (the FITTED kernel), not the prior."""
    path, gpr, _ = _single_pickle(tmp_path, rng, optimizer="fmin_l_bfgs_b")
    post, _ = load_sklearn_gp_pickle(path)
    # fitted hyperparams made it across
    np.testing.assert_allclose(
        float(post.params.length_scale),
        float(gpr.kernel_.k1.length_scale), rtol=1e-12,
    )
    Xq = rng.normal(size=(10, 10))
    mean_ref = gpr.predict(Xq)
    mean, _ = predict(post, jnp.asarray(Xq))
    np.testing.assert_allclose(np.asarray(mean), mean_ref, atol=1e-6)


def _perdim_pickle(tmp_path, rng):
    """The gp_trainer.py format: Const(fixed) * RBF(ARD) + White per output,
    alpha=1e-6, normalize_y=False, StandardScaler both sides."""
    X = rng.normal(size=(50, 10))
    Y = 0.1 * rng.normal(size=(50, 6)) + 0.05 * X[:, :6]
    names = ["x_residual", "y_residual", "z_residual",
             "vx_residual", "vy_residual", "vz_residual"]
    models, sxs, sys_ = {}, {}, {}
    for i, name in enumerate(names):
        sx = StandardScaler().fit(X)
        sy = StandardScaler().fit(Y[:, i : i + 1])
        kernel = (
            ConstantKernel(1.0, constant_value_bounds="fixed")
            * RBF(length_scale=[1.0] * 10)
            + WhiteKernel(noise_level=0.01)
        )
        gpr = GaussianProcessRegressor(
            kernel=kernel, alpha=1e-6, normalize_y=False, optimizer=None
        )
        gpr.fit(sx.transform(X), sy.transform(Y[:, i : i + 1]).ravel())
        models[name], sxs[name], sys_[name] = gpr, sx, sy
    path = tmp_path / "gp_perdim.pkl"
    with open(path, "wb") as f:
        pickle.dump(
            {
                "gp_models": models,
                "scalers_X": sxs,
                "scalers_y": sys_,
                "training_stats": {},
                "model_name": "test",
                "creation_time": 0.0,
            },
            f,
        )
    return str(path), models, sxs, sys_, X


def test_perdim_pickle_parity(tmp_path, rng):
    path, models, sxs, sys_, X = _perdim_pickle(tmp_path, rng)
    model = load_sklearn_perdim_pickle(path)

    Xq = rng.normal(size=(15, 10))
    mean, var = predict_per_dim(model, jnp.asarray(Xq))
    # reference runtime semantics (pretrained_gp.py:60-100): per-dim scale,
    # predict, unscale mean via inverse_transform, std times scaler scale
    names = ["x_residual", "y_residual", "z_residual",
             "vx_residual", "vy_residual", "vz_residual"]
    for i, name in enumerate(names):
        Xs = sxs[name].transform(Xq)
        m_s, s_s = models[name].predict(Xs, return_std=True)
        m_ref = sys_[name].inverse_transform(m_s.reshape(-1, 1)).ravel()
        s_ref = s_s * sys_[name].scale_[0]
        np.testing.assert_allclose(np.asarray(mean[:, i]), m_ref, atol=1e-6)
        np.testing.assert_allclose(
            np.sqrt(np.asarray(var[:, i])), np.abs(s_ref), atol=1e-6
        )


def test_autodetect_and_flight(tmp_path, rng):
    """load_reference_gp dispatches on format, and a loaded single-GP model
    actually flies (the fly --gp-model model.pkl path)."""
    spath, _, _ = _single_pickle(tmp_path, rng)
    ppath, *_ = _perdim_pickle(tmp_path, rng)
    kind_s, post, meta = load_reference_gp(spath)
    kind_p, perdim, _ = load_reference_gp(ppath)
    assert kind_s == "single" and kind_p == "per_dim"

    from unmanned_aerial_vehicles_tpu.control.mpc_linear import (
        LinearMPC,
        LinearMPCConfig,
    )
    from unmanned_aerial_vehicles_tpu.gp import build_horizon_residuals
    from unmanned_aerial_vehicles_tpu.gp.residual_gp import ResidualGPConfig
    from unmanned_aerial_vehicles_tpu.loop import mpc_flight_rollout

    gcfg = ResidualGPConfig()
    post32 = load_reference_gp(spath, dtype=jnp.float32)[1]
    mpc = LinearMPC(LinearMPCConfig(horizon=5, admm_iterations=20),
                    dtype=jnp.float32)

    def ref(t):
        return jnp.stack([0.2 * jnp.sin(t), 0.2 * jnp.cos(t), 3.0 + 0 * t]
                         ), jnp.float32(0.0)

    outs = mpc_flight_rollout(
        mpc, ref, 30,
        residual_fn=lambda Xg, Ug: build_horizon_residuals(
            post32, Xg, Ug, gcfg
        ),
    )
    assert np.isfinite(np.asarray(outs["state"])).all()


def test_perdim_partial_package(tmp_path, rng):
    """gp_trainer.py legitimately skips an output when std(y) < 1e-6
    (pretrained_gp.py:93-96 then predicts zero for it) — a partial package
    must load, with the missing dim predicting exactly zero and the present
    dims untouched."""
    path, models, sxs, sys_, X = _perdim_pickle(tmp_path, rng)
    with open(path, "rb") as f:
        data = pickle.load(f)
    for store in ("gp_models", "scalers_X", "scalers_y"):
        del data[store]["vz_residual"]
    ppath = tmp_path / "gp_perdim_partial.pkl"
    with open(ppath, "wb") as f:
        pickle.dump(data, f)

    model = load_sklearn_perdim_pickle(str(ppath))
    Xq = rng.normal(size=(12, 10))
    mean, _ = predict_per_dim(model, jnp.asarray(Xq))
    np.testing.assert_allclose(np.asarray(mean[:, 5]), 0.0, atol=1e-12)
    # a present dim is unchanged vs the full package
    Xs = sxs["x_residual"].transform(Xq)
    m_ref = sys_["x_residual"].inverse_transform(
        models["x_residual"].predict(Xs).reshape(-1, 1)
    ).ravel()
    np.testing.assert_allclose(np.asarray(mean[:, 0]), m_ref, atol=1e-6)


def test_single_pickle_meta_fit_settings(tmp_path, rng):
    """load_reference_gp surfaces the regressor's actual alpha/normalize_y
    so capacity-capped refits (cli.py) reuse them instead of defaults."""
    X = rng.normal(size=(30, 10))
    Y = 0.1 * rng.normal(size=(30, 6))
    gpr = GaussianProcessRegressor(
        kernel=RBF(0.5) + WhiteKernel(0.1),
        alpha=3e-3, normalize_y=False, optimizer=None,
    )
    gpr.fit(X, Y)
    path = tmp_path / "bare.pkl"
    with open(path, "wb") as f:
        pickle.dump(gpr, f)
    kind, _post, meta = load_reference_gp(str(path))
    assert kind == "single"
    assert meta["jitter"] == pytest.approx(3e-3)
    assert meta["normalize_y"] is False
