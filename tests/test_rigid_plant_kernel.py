"""Parity of the fused rigid-body plant kernel vs the XLA reference path.

The kernel (``ops.rigid_plant_pallas``) re-implements
``models.rigid_body_rk4_step`` as in-kernel scalar arithmetic; these tests
pin f32 agreement on random states (including near-singular pitch, wind,
residuals, substeps) and the n-step rollout against a ``lax.scan``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unmanned_aerial_vehicles_tpu.models import (
    GZ_QUADROTOR_PARAMS,
    X500_PARAMS,
    rigid_body_rk4_step,
)
from unmanned_aerial_vehicles_tpu.ops.rigid_plant_pallas import (
    rigid_body_rk4_step_fused,
    rigid_body_rollout_fused,
)


def _states(rng, n):
    s = rng.normal(size=(n, 12)) * np.array(
        [2, 2, 1, 3, 3, 2, 0.6, 0.6, 2.0, 2, 2, 1.5])
    return jnp.asarray(s, jnp.float32)


@pytest.mark.parametrize("params", [GZ_QUADROTOR_PARAMS, X500_PARAMS])
@pytest.mark.parametrize("substeps", [1, 2])
def test_step_parity(rng, params, substeps):
    xs = _states(rng, 16)
    us = jnp.asarray(
        np.abs(rng.normal(size=(16, 4))) * np.array([6, 0.1, 0.1, 0.1]),
        jnp.float32,
    )
    for i in range(16):
        ref = xs[i]
        if substeps == 1:
            want = rigid_body_rk4_step(ref, us[i], params, 0.02)
        else:
            want = ref
            for _ in range(substeps):
                want = rigid_body_rk4_step(want, us[i], params,
                                           0.02 / substeps)
        got = rigid_body_rk4_step_fused(
            ref, us[i], params, 0.02, substeps=substeps, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want, np.float32),
            rtol=2e-5, atol=2e-5)


def test_step_parity_near_singular_pitch(rng):
    """The reference's |cos(theta)| >= 1e-6 guard must match in-kernel."""
    for th in (np.pi / 2 - 1e-7, np.pi / 2 + 1e-7, -np.pi / 2):
        x = jnp.zeros(12, jnp.float32).at[7].set(th).at[10].set(0.5)
        u = jnp.asarray([5.0, 0.01, 0.0, 0.0], jnp.float32)
        want = rigid_body_rk4_step(x, u, GZ_QUADROTOR_PARAMS, 0.01)
        got = rigid_body_rk4_step_fused(
            x, u, GZ_QUADROTOR_PARAMS, 0.01, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want, np.float32),
            rtol=1e-4, atol=1e-4)


def test_step_parity_with_residual(rng):
    x = _states(rng, 1)[0]
    u = jnp.asarray([5.0, 0.02, -0.01, 0.03], jnp.float32)
    res = jnp.asarray(rng.normal(size=12) * 0.1, jnp.float32)
    want = rigid_body_rk4_step(x, u, GZ_QUADROTOR_PARAMS, 0.02, residual=res)
    got = rigid_body_rk4_step_fused(
        x, u, GZ_QUADROTOR_PARAMS, 0.02, residual=res, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want, np.float32), rtol=2e-5, atol=2e-5)


def test_rollout_matches_scan(rng):
    x0 = jnp.zeros(12, jnp.float32).at[2].set(1.0)
    U = jnp.asarray(
        np.abs(rng.normal(size=(12, 4))) * np.array([6, 0.05, 0.05, 0.05]),
        jnp.float32,
    )

    def scan_roll(x, U):
        def body(c, u):
            xn = rigid_body_rk4_step(c, u, X500_PARAMS, 0.05)
            return xn, xn
        _, xs = jax.lax.scan(body, x, U)
        return xs

    want = np.asarray(scan_roll(x0, U), np.float32)
    got = np.asarray(rigid_body_rollout_fused(
        x0, U, X500_PARAMS, 0.05, interpret=True))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)
