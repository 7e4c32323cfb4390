"""GP analysis module, plotting utilities, native CSV loader."""

import glob
import os

import jax.numpy as jnp
import numpy as np

from unmanned_aerial_vehicles_tpu.gp import fit_residual_gp, predict
from unmanned_aerial_vehicles_tpu.gp.analysis import (
    analyze_gp_model,
    generate_generic_test_points,
    generate_physical_test_points,
)
from unmanned_aerial_vehicles_tpu.io import load_gp_dataset
from unmanned_aerial_vehicles_tpu.io.fast_csv import (
    load_numeric_csv,
    native_available,
)
from unmanned_aerial_vehicles_tpu.loop import run_comparison
from unmanned_aerial_vehicles_tpu.metrics.plots import (
    plot_comparison,
    plot_flight_log,
)

CSV = sorted(glob.glob("/root/reference/gp_datasets/*.csv"))[0]


def test_physical_test_points():
    pts = generate_physical_test_points(500)
    assert pts.shape == (800, 10)  # 500 + 100 hover + 200 trajectory
    assert np.isfinite(pts).all()
    g = generate_generic_test_points(7, 100)
    assert g.shape == (100, 7) and np.abs(g).max() <= 1.0


def test_analyze_gp_model():
    X, Y = load_gp_dataset(CSV)
    post = fit_residual_gp(jnp.asarray(X[:200]), jnp.asarray(Y[:200]))

    def predict_fn(pts):
        m, v = predict(post, jnp.asarray(pts))
        return np.asarray(m), np.asarray(v)

    report = analyze_gp_model(predict_fn, generate_physical_test_points(200))
    assert report["n_test_points"] == 500
    assert set(report["prediction_stats"]) == {
        "res_dx", "res_dy", "res_dz", "res_dvx", "res_dvy", "res_dvz"
    }
    assert report["uncertainty_stats"]["overall_mean_std"] > 0
    assert set(report["uncertainty_stats"]["per_regime"]) == {
        "envelope", "hover", "trajectory"
    }
    # physical envelope is far outside flight data -> more uncertain there
    pr = report["uncertainty_stats"]["per_regime"]
    assert pr["envelope"] >= pr["hover"] * 0.5


def test_plot_flight_log(tmp_path):
    T = 100
    rng = np.random.default_rng(0)
    log = {
        "state": rng.normal(size=(T, 12)) * 0.1,
        "pos_ref": np.zeros((T, 3)),
        "thrust": np.full(T, 0.7),
    }
    path = plot_flight_log(log, str(tmp_path / "flight.png"))
    assert os.path.getsize(path) > 10_000


def test_plot_comparison(tmp_path):
    outs = run_comparison("circle", duration=5.0)
    path = plot_comparison(
        {k: np.asarray(v) for k, v in outs.items()},
        str(tmp_path / "cmp.png"),
        "circle",
    )
    assert os.path.getsize(path) > 10_000


def test_native_csv_parity():
    data_native = load_numeric_csv(CSV, 16)
    data_np = np.atleast_2d(np.genfromtxt(CSV, delimiter=",", skip_header=1))
    np.testing.assert_array_equal(data_native, data_np)
    assert native_available() or True  # informational; fallback is also valid


def test_native_csv_bad_file(tmp_path):
    bad = tmp_path / "bad.csv"
    bad.write_text("a,b\n1,2,3\n")
    out = load_numeric_csv(str(bad), 3)  # native rejects, numpy fallback
    assert out.shape[1] == 3
