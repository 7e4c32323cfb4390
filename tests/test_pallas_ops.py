"""Pallas kernel parity tests (interpreter mode on CPU).

The real-TPU behaviour of both kernels is exercised by bench.py and the
closed-loop drives; here we pin numerical parity against the XLA reference
implementations on small shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from unmanned_aerial_vehicles_tpu.gp.kernels import rbf_kernel
from unmanned_aerial_vehicles_tpu.ops.admm_pallas import admm_box_qp_fused
from unmanned_aerial_vehicles_tpu.ops.qp import admm_box_qp
from unmanned_aerial_vehicles_tpu.ops.rbf_pallas import rbf_kernel_matrix_pallas


def test_rbf_pallas_matches_xla(rng):
    X1 = jnp.asarray(rng.normal(size=(300, 10)), jnp.float32)
    X2 = jnp.asarray(rng.normal(size=(257, 10)), jnp.float32)
    K_pallas = rbf_kernel_matrix_pallas(X1, X2, 0.5, 1.3, interpret=True)
    K_xla = rbf_kernel(X1, X2, jnp.float32(0.5), jnp.float32(1.3))
    assert K_pallas.shape == (300, 257)
    np.testing.assert_allclose(
        np.asarray(K_pallas), np.asarray(K_xla), atol=5e-6
    )


def test_rbf_pallas_ard_lengthscales(rng):
    X = jnp.asarray(rng.normal(size=(100, 6)), jnp.float32)
    ls = jnp.asarray([0.3, 0.5, 1.0, 2.0, 0.7, 1.5], jnp.float32)
    K_pallas = rbf_kernel_matrix_pallas(X, X, ls, 1.0, interpret=True)
    K_xla = rbf_kernel(X, X, ls, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(K_pallas), np.asarray(K_xla), atol=5e-6)


def test_fused_admm_matches_unfused(rng):
    n, m = 24, 40
    Q = rng.normal(size=(n, n))
    H = (Q @ Q.T + n * np.eye(n)).astype(np.float32)
    G = np.vstack([np.eye(n), rng.normal(size=(m - n, n))]).astype(np.float32)
    f = (rng.normal(size=n) * 50).astype(np.float32)
    lo = -0.5 * np.ones(m, np.float32)
    hi = 0.5 * np.ones(m, np.float32)
    rho, iters = 10.0, 300
    M_inv = np.linalg.inv(H + rho * G.T @ G).astype(np.float32)

    ref = admm_box_qp(
        jnp.asarray(M_inv), jnp.asarray(G), jnp.asarray(f),
        jnp.asarray(lo), jnp.asarray(hi),
        jnp.zeros(m, jnp.float32), jnp.zeros(m, jnp.float32),
        rho, iters,
    )

    # padded fused version
    n_pad, m_pad = 128, 128
    Mp = np.zeros((n_pad, n_pad), np.float32); Mp[:n, :n] = M_inv
    Gp = np.zeros((m_pad, n_pad), np.float32); Gp[:m, :n] = G
    pad = lambda v, size: jnp.zeros((1, size), jnp.float32).at[0, : v.shape[0]].set(v)
    U, z, y = admm_box_qp_fused(
        jnp.asarray(Mp), jnp.asarray(Gp), jnp.asarray(Gp.T.copy()),
        pad(jnp.asarray(f), n_pad),
        pad(jnp.asarray(lo), m_pad), pad(jnp.asarray(hi), m_pad),
        jnp.zeros((1, m_pad), jnp.float32), jnp.zeros((1, m_pad), jnp.float32),
        rho, iters, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(U[0, :n]), np.asarray(ref.primal), atol=2e-4)
    np.testing.assert_allclose(np.asarray(z[0, :m]), np.asarray(ref.slack), atol=2e-4)
    # padding must stay exactly zero
    np.testing.assert_array_equal(np.asarray(U[0, n:]), 0.0)
    np.testing.assert_array_equal(np.asarray(z[0, m:]), 0.0)


def test_linear_mpc_fused_flag_matches(rng):
    from unmanned_aerial_vehicles_tpu.control.mpc_linear import (
        LinearMPC,
        LinearMPCConfig,
    )
    import unmanned_aerial_vehicles_tpu.ops.admm_pallas as ap
    import unmanned_aerial_vehicles_tpu.control.mpc_linear as ml
    import functools

    # route the fused path through the interpreter on CPU
    orig = ap.admm_box_qp_fused_composite
    ml_orig = getattr(ml, "admm_box_qp_fused_composite", None)
    try:
        wrapped = functools.partial(orig, interpret=True)
        ap.admm_box_qp_fused_composite = wrapped

        state = jnp.asarray([1.0, -2.0, 2.0, 0.5, 0.0, -0.1], jnp.float32)
        target = jnp.asarray([0.0, 0.0, 3.0], jnp.float32)
        a = LinearMPC(LinearMPCConfig(horizon=10, admm_iterations=100), dtype=jnp.float32)
        b = LinearMPC(
            LinearMPCConfig(horizon=10, admm_iterations=100, use_fused_admm=True),
            dtype=jnp.float32,
        )
        u_a, _, _ = a.solve(a.init_carry(state), state, target)
        u_b, _, _ = b.solve(b.init_carry(state), state, target)
        np.testing.assert_allclose(np.asarray(u_a), np.asarray(u_b), atol=1e-4)
    finally:
        ap.admm_box_qp_fused_composite = orig
        if ml_orig is not None:
            ml.admm_box_qp_fused_composite = ml_orig


def test_fused_plant_matches_xla(rng):
    from unmanned_aerial_vehicles_tpu.models import (
        RateLoopParams,
        RigidBodyParams,
        px4_rate_tracking_step,
    )
    from unmanned_aerial_vehicles_tpu.ops.plant_pallas import px4_plant_step_fused

    body = RigidBodyParams()
    rl = RateLoopParams()
    for i in range(3):
        s = jnp.asarray(rng.normal(size=12) * 0.3, jnp.float32)
        c = jnp.asarray([1.0, 0.1, -0.1, 0.05], jnp.float32)
        ref = s
        for _ in range(2):
            ref = px4_rate_tracking_step(ref, c, body, rl, 0.01)
        fused = px4_plant_step_fused(
            s, c, body.mass, body.gravity, body.k_drag_linear,
            (rl.tau_roll, rl.tau_pitch, rl.tau_yaw), 0.02, 2, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref, dtype=np.float32), atol=2e-6
        )


def test_allocation_plant_tick_matches_xla(rng):
    from unmanned_aerial_vehicles_tpu.control.allocation import (
        AttitudeLoopState,
        geometric_control_allocation,
    )
    from unmanned_aerial_vehicles_tpu.models import (
        RateLoopParams,
        RigidBodyParams,
        px4_rate_tracking_step,
    )
    from unmanned_aerial_vehicles_tpu.ops.plant_pallas import (
        allocation_plant_tick_fused,
    )

    body = RigidBodyParams()
    rl = RateLoopParams()
    for i in range(3):
        s = jnp.asarray(rng.normal(size=12) * 0.3, jnp.float32)
        accel = jnp.asarray(rng.normal(size=3), jnp.float32)
        yawrate = jnp.float32(0.2)
        yaw_t = jnp.float32(0.1)
        integral = jnp.asarray(rng.normal(size=3) * 0.05, jnp.float32)

        thrust, rates, att_sp, carry = geometric_control_allocation(
            AttitudeLoopState(integral=integral), accel, yaw_t, yawrate,
            s[6:9], s[9:12], dt_attitude=0.02,
        )
        control = jnp.concatenate([thrust[None], rates])
        ref_state = s
        for _ in range(2):
            ref_state = px4_rate_tracking_step(ref_state, control, body, rl, 0.01)

        new_state, ctrl_f, att_f, int_f = allocation_plant_tick_fused(
            s, accel, yawrate, yaw_t, integral,
            body.mass, body.gravity, body.k_drag_linear,
            (rl.tau_roll, rl.tau_pitch, rl.tau_yaw), 0.02, 2, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(new_state), np.asarray(ref_state, np.float32), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(ctrl_f), np.asarray(control, np.float32), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(att_f), np.asarray(att_sp, np.float32), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(int_f), np.asarray(carry.integral, np.float32), atol=5e-6
        )


def test_fused_controller_matches_reference_path(rng):
    import functools

    import unmanned_aerial_vehicles_tpu.ops.controller_pallas as cp
    from unmanned_aerial_vehicles_tpu.control.mpc_linear import (
        LinearMPC,
        LinearMPCConfig,
    )

    orig = cp.gpmpc_controller_fused
    try:
        cp.gpmpc_controller_fused = functools.partial(
            orig.__wrapped__, interpret=True
        )
        state = jnp.asarray([4.0, -3.0, 1.0, 1.5, -0.5, 0.2], jnp.float32)
        target = jnp.asarray([-4.0, 3.0, 3.0], jnp.float32)
        D = jnp.zeros((20, 6), jnp.float32).at[:, 5].set(1.5)

        a = LinearMPC(LinearMPCConfig(horizon=20, admm_iterations=100),
                      dtype=jnp.float32)
        b = LinearMPC(
            LinearMPCConfig(horizon=20, admm_iterations=100,
                            use_fused_controller=True),
            dtype=jnp.float32,
        )
        ca, cb = a.init_carry(state), b.init_carry(state)
        for _ in range(3):  # warm-started ticks must track each other
            ua, Xa, ca = a.solve(ca, state, target, D)
            ub, Xb, cb = b.solve(cb, state, target, D)
        np.testing.assert_allclose(np.asarray(ua), np.asarray(ub), atol=1e-4)
        np.testing.assert_allclose(np.asarray(Xa), np.asarray(Xb), atol=1e-4)
    finally:
        cp.gpmpc_controller_fused = orig


def test_fused_plant_under_vmap(rng):
    """pallas_call batches correctly under vmap (throughput mode still
    prefers the XLA path — see NOTES.md — but correctness must hold)."""
    from unmanned_aerial_vehicles_tpu.models import (
        RateLoopParams,
        RigidBodyParams,
        px4_rate_tracking_step,
    )
    from unmanned_aerial_vehicles_tpu.ops.plant_pallas import px4_plant_step_fused

    body = RigidBodyParams()
    rl = RateLoopParams()
    B = 8
    S = jnp.asarray(rng.normal(size=(B, 12)) * 0.2, jnp.float32)
    C = jnp.asarray(
        np.column_stack([np.ones(B), 0.1 * rng.normal(size=(B, 3))]), jnp.float32
    )
    out = jax.vmap(
        lambda s, c: px4_plant_step_fused(
            s, c, body.mass, body.gravity, body.k_drag_linear,
            (0.05, 0.05, 0.08), 0.02, 2, interpret=True,
        )
    )(S, C)
    ref = S
    for _ in range(2):
        ref = jax.vmap(lambda s, c: px4_rate_tracking_step(s, c, body, rl, 0.01))(ref, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref, np.float32), atol=5e-6)


def test_fused_tick_rollout_matches_staged(rng):
    """The whole-tick kernel (ops.tick_pallas) must reproduce the staged
    XLA rollout (same ADMM semantics, shift, allocation, plant) closely
    over a closed-loop flight: feedback keeps f32 path differences bounded."""
    import glob

    from unmanned_aerial_vehicles_tpu.control.mpc_linear import (
        LinearMPC,
        LinearMPCConfig,
    )
    from unmanned_aerial_vehicles_tpu.gp import (
        build_horizon_residuals,
        fit_residual_gp,
    )
    from unmanned_aerial_vehicles_tpu.gp.residual_gp import ResidualGPConfig
    from unmanned_aerial_vehicles_tpu.io import load_gp_datasets
    from unmanned_aerial_vehicles_tpu.loop import (
        FlightLoopConfig,
        mpc_flight_rollout,
    )
    from unmanned_aerial_vehicles_tpu.trajectories import ramped_figure8_reference

    def ref(t):
        pos, yaw = ramped_figure8_reference(t, amplitude=2.0, frequency=0.1)
        return pos + jnp.array([0.0, 0.0, 3.0]), yaw

    paths = sorted(glob.glob("/root/reference/gp_datasets/*.csv"))
    residual_fn = None
    if paths:
        gp_cfg = ResidualGPConfig()
        X, Y = load_gp_datasets(paths[:4], max_samples=200)
        post = fit_residual_gp(
            jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32), gp_cfg
        )
        residual_fn = lambda Xg, Ug: build_horizon_residuals(post, Xg, Ug, gp_cfg)

    kw = dict(horizon=10, admm_iterations=80)
    staged = LinearMPC(LinearMPCConfig(**kw), dtype=jnp.float32)
    fused = LinearMPC(
        LinearMPCConfig(**kw, use_fused_controller=True), dtype=jnp.float32
    )
    T = 100
    out_a = jax.jit(
        lambda: mpc_flight_rollout(staged, ref, T, cfg=FlightLoopConfig(),
                                   residual_fn=residual_fn)
    )()
    out_b = jax.jit(
        lambda: mpc_flight_rollout(fused, ref, T,
                                   cfg=FlightLoopConfig(use_fused_tick=True),
                                   residual_fn=residual_fn)
    )()
    sa = np.asarray(out_a["state"], np.float64)
    sb = np.asarray(out_b["state"], np.float64)
    assert np.isfinite(sb).all()
    # whole-flight position agreement between the two implementations
    gap = np.abs(sa[:, 0:3] - sb[:, 0:3]).max()
    assert gap < 5e-3, f"fused-tick position gap {gap:.2e}"
    np.testing.assert_allclose(
        np.asarray(out_a["u_mpc"]), np.asarray(out_b["u_mpc"]), atol=5e-3
    )
    # both paths must expose the identical log schema
    assert set(out_a.keys()) == set(out_b.keys())


def test_batched_sweep_matches_vmapped_rollout(rng):
    """Throughput mode: the gridded batch-controller kernel must reproduce
    the vmapped staged rollout across a batch of flights."""
    from unmanned_aerial_vehicles_tpu.control.mpc_linear import (
        LinearMPC,
        LinearMPCConfig,
    )
    from unmanned_aerial_vehicles_tpu.loop import FlightLoopConfig
    from unmanned_aerial_vehicles_tpu.loop.closed_loop import (
        batched_mpc_flight_sweep,
        mpc_flight_rollout,
    )
    from unmanned_aerial_vehicles_tpu.trajectories import ramped_figure8_reference

    def ref(t):
        pos, yaw = ramped_figure8_reference(t, amplitude=2.0, frequency=0.1)
        return pos + jnp.array([0.0, 0.0, 3.0]), yaw

    kw = dict(horizon=10, admm_iterations=60)
    staged = LinearMPC(LinearMPCConfig(**kw), dtype=jnp.float32)
    fused = LinearMPC(
        LinearMPCConfig(**kw, use_fused_controller=True), dtype=jnp.float32
    )
    B, T = 4, 40
    starts = jnp.zeros((B, 12), jnp.float32).at[:, 2].set(3.0)
    starts = starts.at[:, 0].set(jnp.linspace(-0.5, 0.5, B, dtype=jnp.float32))

    out_b = jax.jit(
        lambda: batched_mpc_flight_sweep(
            fused, ref, T, starts, cfg=FlightLoopConfig()
        )
    )()
    out_v = jax.jit(
        lambda: jax.vmap(
            lambda x0: mpc_flight_rollout(
                staged, ref, T, cfg=FlightLoopConfig(), initial_state=x0
            )["state"]
        )(starts)
    )()
    sb = np.asarray(out_b["state"])          # (T, B, 12)
    sv = np.transpose(np.asarray(out_v), (1, 0, 2))
    assert sb.shape == sv.shape == (T, B, 12)
    gap = np.abs(sb[:, :, 0:3] - sv[:, :, 0:3]).max()
    assert gap < 5e-3, f"batched sweep position gap {gap:.2e}"


def test_multitick_rollout_matches_fused_tick(rng):
    """K-ticks-per-dispatch kernel (GP inside) must reproduce the
    single-tick fused rollout closely over a closed-loop flight."""
    import glob

    from unmanned_aerial_vehicles_tpu.control.mpc_linear import (
        LinearMPC,
        LinearMPCConfig,
    )
    from unmanned_aerial_vehicles_tpu.gp import (
        build_horizon_residuals,
        fit_residual_gp,
    )
    from unmanned_aerial_vehicles_tpu.gp.residual_gp import ResidualGPConfig
    from unmanned_aerial_vehicles_tpu.io import load_gp_datasets
    from unmanned_aerial_vehicles_tpu.loop import (
        FlightLoopConfig,
        mpc_flight_rollout,
    )
    from unmanned_aerial_vehicles_tpu.trajectories import ramped_figure8_reference

    def ref(t):
        pos, yaw = ramped_figure8_reference(t, amplitude=2.0, frequency=0.1)
        return pos + jnp.array([0.0, 0.0, 3.0]), yaw

    gp_cfg = ResidualGPConfig()
    paths = sorted(glob.glob("/root/reference/gp_datasets/*.csv"))
    residual_fn, post = None, None
    if paths:
        X, Y = load_gp_datasets(paths[:4], max_samples=200)
        post = fit_residual_gp(
            jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32), gp_cfg
        )
        residual_fn = lambda Xg, Ug: build_horizon_residuals(post, Xg, Ug, gp_cfg)

    mpc = LinearMPC(
        LinearMPCConfig(horizon=10, admm_iterations=40,
                        use_fused_controller=True),
        dtype=jnp.float32,
    )
    T = 40
    for preview in (False, True):
        out_a = jax.jit(
            lambda p=preview: mpc_flight_rollout(
                mpc, ref, T, cfg=FlightLoopConfig(use_fused_tick=True),
                residual_fn=residual_fn, preview=p,
            )
        )()
        out_b = jax.jit(
            lambda p=preview: mpc_flight_rollout(
                mpc, ref, T,
                cfg=FlightLoopConfig(use_fused_tick=True,
                                     ticks_per_dispatch=4),
                gp_posterior=post, gp_gain=gp_cfg.residual_gain, preview=p,
            )
        )()
        assert set(out_a.keys()) == set(out_b.keys())
        for key in ("state", "u_mpc", "thrust", "accel_cmd", "vel_ref",
                    "att_ref", "rates_cmd", "pos_ref"):
            np.testing.assert_allclose(
                np.asarray(out_a[key]), np.asarray(out_b[key]), atol=2e-4,
                err_msg=f"{key} (preview={preview})",
            )
        np.testing.assert_allclose(
            np.asarray(out_a["final_state"]), np.asarray(out_b["final_state"]),
            atol=2e-4,
        )


def test_multitick_requires_divisible_steps():
    from unmanned_aerial_vehicles_tpu.control.mpc_linear import (
        LinearMPC,
        LinearMPCConfig,
    )
    from unmanned_aerial_vehicles_tpu.loop import (
        FlightLoopConfig,
        mpc_flight_rollout,
    )

    mpc = LinearMPC(
        LinearMPCConfig(horizon=5, admm_iterations=10,
                        use_fused_controller=True),
        dtype=jnp.float32,
    )
    ref = lambda t: (jnp.array([0.0, 0.0, 3.0]), jnp.float32(0.0))
    try:
        mpc_flight_rollout(
            mpc, ref, 10,
            cfg=FlightLoopConfig(use_fused_tick=True, ticks_per_dispatch=4),
        )
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_posterior_mean_pallas_matches_predict_mean(rng):
    """Limb-compensated fused posterior mean vs gp.exact_gp.predict_mean.

    "highest" packs 6 bf16-limb products into the dead K lanes of the
    skinny distance dot (f32-grade); "high" 3 (~2^-17); "default" is plain
    single-limb bf16."""
    from unmanned_aerial_vehicles_tpu.gp import fit_residual_gp
    from unmanned_aerial_vehicles_tpu.gp.exact_gp import predict_mean
    from unmanned_aerial_vehicles_tpu.gp.residual_gp import ResidualGPConfig
    from unmanned_aerial_vehicles_tpu.ops.rbf_pallas import (
        rbf_posterior_mean_pallas,
    )

    X = jnp.asarray(rng.normal(size=(300, 10)), jnp.float32)
    Y = jnp.asarray(0.05 * rng.normal(size=(300, 6)), jnp.float32)
    post = fit_residual_gp(X, Y, ResidualGPConfig())
    Xt = jnp.asarray(rng.normal(size=(777, 10)), jnp.float32)
    ref = predict_mean(post, Xt)
    for prec, atol in (("highest", 5e-7), ("high", 1e-5), ("default", 5e-3)):
        got = rbf_posterior_mean_pallas(post, Xt, interpret=True,
                                        precision=prec)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=atol)


def test_posterior_mean_pallas_x_shift(rng):
    """Centered (standardized-input ARD) posteriors flow through the fused
    mean kernel exactly like the staged predict."""
    from unmanned_aerial_vehicles_tpu.gp import fit_residual_gp
    from unmanned_aerial_vehicles_tpu.gp.exact_gp import predict_mean
    from unmanned_aerial_vehicles_tpu.gp.residual_gp import ResidualGPConfig
    from unmanned_aerial_vehicles_tpu.ops.rbf_pallas import (
        rbf_posterior_mean_pallas,
    )

    X = jnp.asarray(rng.normal(size=(200, 10)), jnp.float32)
    Y = jnp.asarray(0.05 * rng.normal(size=(200, 6)), jnp.float32)
    post = fit_residual_gp(X, Y, ResidualGPConfig())
    post = post.replace(x_shift=jnp.asarray(rng.normal(size=10), jnp.float32))
    Xt = jnp.asarray(rng.normal(size=(130, 10)), jnp.float32)
    got = rbf_posterior_mean_pallas(post, Xt, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(predict_mean(post, Xt)), atol=5e-7
    )


def test_batched_fused_residuals_match_vmapped(rng):
    """build_horizon_residuals_batched_fused == vmap(build_horizon_residuals)."""
    from unmanned_aerial_vehicles_tpu.gp import (
        build_horizon_residuals,
        fit_residual_gp,
    )
    from unmanned_aerial_vehicles_tpu.gp.residual_gp import (
        ResidualGPConfig,
        build_horizon_residuals_batched_fused,
    )

    cfg = ResidualGPConfig()
    X = jnp.asarray(rng.normal(size=(150, 10)), jnp.float32)
    Y = jnp.asarray(0.05 * rng.normal(size=(150, 6)), jnp.float32)
    post = fit_residual_gp(X, Y, cfg)
    B, N = 5, 12
    Xg = jnp.asarray(rng.normal(size=(B, N + 1, 6)), jnp.float32)
    Ug = jnp.asarray(rng.normal(size=(B, N, 4)), jnp.float32)
    ref = jax.vmap(lambda a, b: build_horizon_residuals(post, a, b, cfg))(Xg, Ug)
    got = build_horizon_residuals_batched_fused(
        post, Xg, Ug, cfg, precision="highest", interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_batched_sweep_fused_gp_matches_staged(rng):
    """gp_posterior routing through the fused Pallas mean kernel reproduces
    the vmapped residual_fn sweep ("highest" is bit-identical on CPU)."""
    from unmanned_aerial_vehicles_tpu.control.mpc_linear import (
        LinearMPC,
        LinearMPCConfig,
    )
    from unmanned_aerial_vehicles_tpu.gp import (
        build_horizon_residuals,
        fit_residual_gp,
    )
    from unmanned_aerial_vehicles_tpu.gp.residual_gp import ResidualGPConfig
    from unmanned_aerial_vehicles_tpu.loop.closed_loop import (
        FlightLoopConfig,
        batched_mpc_flight_sweep,
    )

    gp_cfg = ResidualGPConfig()
    X = jnp.asarray(rng.normal(size=(120, 10)), jnp.float32)
    Y = jnp.asarray(0.05 * rng.normal(size=(120, 6)), jnp.float32)
    post = fit_residual_gp(X, Y, gp_cfg)
    mpc = LinearMPC(
        LinearMPCConfig(horizon=10, admm_iterations=5,
                        use_fused_controller=True)
    )
    ref_fn = lambda t: (jnp.array([1.0, 0.5, 3.0]), jnp.float32(0.0))
    starts = jnp.zeros((4, 12), jnp.float32).at[:, 2].set(3.0)
    rf = lambda Xg, Ug: build_horizon_residuals(post, Xg, Ug, gp_cfg)
    o_staged = batched_mpc_flight_sweep(
        mpc, ref_fn, 30, starts, cfg=FlightLoopConfig(), residual_fn=rf
    )
    o_fused = batched_mpc_flight_sweep(
        mpc, ref_fn, 30, starts, cfg=FlightLoopConfig(),
        gp_posterior=post, gp_cfg=gp_cfg, gp_fused_precision="highest",
    )
    np.testing.assert_allclose(
        np.asarray(o_fused["state"]), np.asarray(o_staged["state"]), atol=1e-6
    )
    # the bf16 throughput tier stays within a bounded trajectory shift
    o_bf16 = batched_mpc_flight_sweep(
        mpc, ref_fn, 30, starts, cfg=FlightLoopConfig(),
        gp_posterior=post, gp_cfg=gp_cfg, gp_fused_precision="default",
    )
    assert float(jnp.max(jnp.abs(o_bf16["state"] - o_staged["state"]))) < 1e-4


def test_posterior_mean_pallas_large_train_fallback(rng):
    """Corpus-scale posteriors (train set > 4096 padded) exceed the kernel's
    VMEM residency budget; the wrapper must route to the staged predict."""
    from unmanned_aerial_vehicles_tpu.gp import fit_residual_gp
    from unmanned_aerial_vehicles_tpu.gp.exact_gp import predict_mean
    from unmanned_aerial_vehicles_tpu.gp.residual_gp import ResidualGPConfig
    from unmanned_aerial_vehicles_tpu.ops.rbf_pallas import (
        rbf_posterior_mean_pallas,
    )

    X = jnp.asarray(rng.normal(size=(4200, 10)), jnp.float32)
    Y = jnp.asarray(0.05 * rng.normal(size=(4200, 6)), jnp.float32)
    post = fit_residual_gp(X, Y, ResidualGPConfig())
    Xt = jnp.asarray(rng.normal(size=(64, 10)), jnp.float32)
    got = rbf_posterior_mean_pallas(post, Xt, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(predict_mean(post, Xt)), atol=1e-6
    )


def test_warm_shift_rolls_equals_shift_matrix(rng):
    """The lane-roll warm-start shift is exactly z @ ShiftT for every
    (N, nu, nx) layout the tick kernels use."""
    from unmanned_aerial_vehicles_tpu.ops.tick_pallas import (
        _warm_shift_rolls,
        build_shift_matrix,
    )

    for N, nu, nx, m_pad in ((20, 4, 6, 256), (10, 4, 6, 128), (5, 2, 3, 128)):
        S = build_shift_matrix(N, nu, nx, m_pad)
        z = jnp.asarray(rng.normal(size=(2, m_pad)), jnp.float32)
        # padded lanes are zero in real use; zero them so both forms agree
        z = z.at[:, N * (nu + nx):].set(0.0)
        want = z @ jnp.asarray(S)
        got = _warm_shift_rolls(z, N * nu, N * nx, nu, nx, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_split_limbs_reconstruction(rng):
    """bf16 limb splits: 3 limbs reconstruct f32 exactly (24 mantissa bits);
    the masked in-kernel variant too. Guards the compensation scheme the
    fused GP kernel's accuracy tiers rest on."""
    from unmanned_aerial_vehicles_tpu.ops.rbf_pallas import (
        _split_limbs,
        _split_limbs_masked,
    )

    x = jnp.asarray(
        rng.normal(size=(64, 16)) * np.exp(rng.uniform(-8, 8, size=(64, 16))),
        jnp.float32,
    )
    for split in (_split_limbs, _split_limbs_masked):
        limbs = split(x, 3)
        recon = sum(jnp.asarray(l, jnp.float32) for l in limbs)
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(x))
        # 2-limb error is bounded by ~2^-16 relative
        limbs2 = split(x, 2)
        recon2 = sum(jnp.asarray(l, jnp.float32) for l in limbs2)
        rel = np.abs(np.asarray(recon2 - x)) / np.maximum(np.abs(np.asarray(x)), 1e-30)
        assert rel.max() < 2.0**-15, rel.max()
