"""Multi-chip full-corpus GP training (parallel.distributed_gp).

Validates the row-sharded Gram + preconditioned-CG trainer on the virtual
8-device CPU mesh against the dense single-chip Cholesky fit — the parity
contract that lets ``train-gp --all-samples`` replace the reference's 10k
down-sampling cap (``/root/reference/src/px4/train_gp_offline.py:155-163``).
"""

import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unmanned_aerial_vehicles_tpu.gp import fit_residual_gp
from unmanned_aerial_vehicles_tpu.gp.exact_gp import predict, predict_mean
from unmanned_aerial_vehicles_tpu.gp.residual_gp import ResidualGPConfig
from unmanned_aerial_vehicles_tpu.io import load_gp_datasets
from unmanned_aerial_vehicles_tpu.parallel import (
    fit_residual_gp_sharded,
    make_mesh,
    predict_mean_sharded,
    predict_sharded,
)
from unmanned_aerial_vehicles_tpu.parallel.distributed_gp import _cg

CSVS = sorted(glob.glob("/root/reference/gp_datasets/*.csv"))


@pytest.fixture(scope="module")
def corpus():
    if not CSVS:
        pytest.skip("reference gp_datasets not mounted")
    X, Y = load_gp_datasets(CSVS[:6], max_samples=300)
    return np.asarray(X), np.asarray(Y)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_sharded_fit_matches_dense_cholesky(corpus, mesh):
    """CG alpha/posterior mean parity <= 1e-6 vs the dense fit, on a real
    flight-CSV subset whose row count (300) does NOT divide the mesh —
    exercising the padding/mask path."""
    X, Y = corpus
    cfg = ResidualGPConfig()
    post_s = fit_residual_gp_sharded(X, Y, mesh=mesh, config=cfg,
                                     cg_iterations=150)
    assert float(post_s.cg_residual) < 1e-10

    post_d = fit_residual_gp(jnp.asarray(X), jnp.asarray(Y), cfg)
    Xq = jnp.asarray(X[::17])
    np.testing.assert_allclose(
        np.asarray(predict_mean_sharded(post_s, Xq, mesh=mesh)),
        np.asarray(predict_mean(post_d, Xq)),
        atol=1e-6,
    )


def test_sharded_variance_matches_dense(corpus, mesh):
    X, Y = corpus
    cfg = ResidualGPConfig()
    post_s = fit_residual_gp_sharded(X, Y, mesh=mesh, config=cfg,
                                     cg_iterations=150)
    Xq = jnp.asarray(X[::41])
    mean_s, var_s = predict_sharded(post_s, Xq, mesh=mesh, config=cfg,
                                    cg_iterations=150)
    mean_d, var_d = predict(fit_residual_gp(jnp.asarray(X), jnp.asarray(Y), cfg), Xq)
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_d), atol=1e-6)


def test_host_view_feeds_the_control_loop(corpus, mesh):
    """to_gp_posterior() plugs into build_horizon_residuals unchanged."""
    from unmanned_aerial_vehicles_tpu.gp import build_horizon_residuals

    X, Y = corpus
    cfg = ResidualGPConfig()
    post_s = fit_residual_gp_sharded(X, Y, mesh=mesh, config=cfg,
                                     cg_iterations=150)
    view = post_s.to_gp_posterior()
    Xg = jnp.zeros((21, 6)).at[:, 2].set(3.0)
    Ug = jnp.zeros((20, 4))
    D = build_horizon_residuals(view, Xg, Ug, cfg)
    assert D.shape == (20, 6)
    assert np.isfinite(np.asarray(D)).all()


def test_nystrom_preconditioner_accelerates_cg(corpus, mesh):
    """At a fixed (small) iteration budget the Nystrom-preconditioned solve
    must reach a much smaller residual than plain CG."""
    X, Y = corpus
    cfg = ResidualGPConfig()
    iters = 12
    post_pre = fit_residual_gp_sharded(X, Y, mesh=mesh, config=cfg,
                                       cg_iterations=iters, precond_size=128)
    post_plain = fit_residual_gp_sharded(X, Y, mesh=mesh, config=cfg,
                                         cg_iterations=iters, precond_size=1)
    r_pre = float(post_pre.cg_residual)
    r_plain = float(post_plain.cg_residual)
    assert r_pre < r_plain / 10.0, (r_pre, r_plain)


def test_cg_solves_a_known_system(mesh):
    """_cg against a dense solve on a synthetic SPD system, sharded."""
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    n, out = 64, 3
    A_half = rng.normal(size=(n, n))
    A = A_half @ A_half.T + n * np.eye(n)
    b = rng.normal(size=(n, out))
    x_ref = np.linalg.solve(A, b)

    Aj = jnp.asarray(A)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("batch"), P("batch")), out_specs=(P("batch"), P()),
    )
    def run(A_loc, b_loc):
        def matvec(v_loc):
            v_full = jax.lax.all_gather(v_loc, "batch", tiled=True)
            return jnp.matmul(A_loc, v_full,
                              precision=jax.lax.Precision.HIGHEST)
        return _cg(matvec, lambda r: r, b_loc, 200)

    x, res = jax.jit(run)(Aj, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-8)
    assert float(res) < 1e-8
