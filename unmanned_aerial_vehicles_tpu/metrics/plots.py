"""Plotting utilities for flight logs and controller comparisons.

Replaces the reference's matplotlib surfaces — the 12-panel rosbag analysis
(``/root/reference/src/px4/enhanced_plot_mpc_bag.py:863+``), the 8-panel
PID-vs-MPC comparison (``quadrotor_gp_mpc/main.py:629-763``) and the
GP/MPC metric plots (``performance_metrics.py:137-447``) — operating on the
stacked arrays of fused rollouts (or saved flight logs) instead of decoded
bag messages. Matplotlib with the Agg backend: headless-safe.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_flight_log(log: dict, save_path: str, title: str = "flight"):
    """Multi-panel flight analysis (trajectory, per-axis tracking, attitude,
    thrust; the ``enhanced_plot_mpc_bag`` panel set)."""
    plt = _plt()
    state = np.asarray(log["state"])
    pos_ref = np.asarray(log["pos_ref"])
    T = state.shape[0]
    t = np.arange(T)

    fig, axes = plt.subplots(3, 3, figsize=(16, 10))
    fig.suptitle(title)

    ax = axes[0, 0]
    ax.plot(pos_ref[:, 0], pos_ref[:, 1], "k--", label="reference")
    ax.plot(state[:, 0], state[:, 1], label="actual")
    ax.set_title("XY trajectory")
    ax.legend()
    ax.axis("equal")

    for i, name in enumerate("xyz"):
        ax = axes[0, 1] if i == 0 else (axes[0, 2] if i == 1 else axes[1, 0])
        ax.plot(t, pos_ref[:, i], "k--")
        ax.plot(t, state[:, i])
        ax.set_title(f"{name} tracking")

    err = np.linalg.norm(pos_ref - state[:, 0:3], axis=1)
    axes[1, 1].plot(t, err)
    axes[1, 1].set_title(
        f"position error (RMS {np.sqrt(np.mean(err**2)):.3f} m, "
        f"max {err.max():.3f} m)"
    )

    axes[1, 2].plot(t, state[:, 3:6])
    axes[1, 2].set_title("velocity")
    axes[1, 2].legend(["vx", "vy", "vz"])

    axes[2, 0].plot(t, np.degrees(state[:, 6:9]))
    axes[2, 0].set_title("attitude [deg]")
    axes[2, 0].legend(["roll", "pitch", "yaw"])

    if "thrust" in log:
        thrust = np.asarray(log["thrust"])
        axes[2, 1].plot(t, thrust)
        sat = 100.0 * np.mean((thrust >= 0.99) | (thrust <= 0.11))
        axes[2, 1].set_title(f"normalized thrust (saturation {sat:.1f}%)")

    axes[2, 2].plot(t, state[:, 9:12])
    axes[2, 2].set_title("body rates")
    axes[2, 2].legend(["p", "q", "r"])

    fig.tight_layout()
    fig.savefig(save_path, dpi=110)
    plt.close(fig)
    return save_path


def plot_comparison(outs: dict, save_path: str, traj_type: str = ""):
    """PID-vs-GP-MPC comparison panels (``main.py:629-763``): trajectories,
    tracking errors, error statistics, control signals."""
    plt = _plt()
    t = np.arange(np.asarray(outs["pid_error"]).shape[0])

    fig, axes = plt.subplots(2, 2, figsize=(14, 9))
    fig.suptitle(f"Cascade PID vs GP-MPC — {traj_type}")

    ax = axes[0, 0]
    ref = np.asarray(outs["ref_pos"])
    ax.plot(ref[:, 0], ref[:, 1], "k--", label="reference")
    ax.plot(np.asarray(outs["pid_pos"])[:, 0], np.asarray(outs["pid_pos"])[:, 1],
            label="PID")
    ax.plot(np.asarray(outs["mpc_pos"])[:, 0], np.asarray(outs["mpc_pos"])[:, 1],
            label="GP-MPC")
    ax.set_title("XY trajectories")
    ax.legend()
    ax.axis("equal")

    pid_e = np.asarray(outs["pid_error"])
    mpc_e = np.asarray(outs["mpc_error"])
    axes[0, 1].plot(t, pid_e, label="PID")
    axes[0, 1].plot(t, mpc_e, label="GP-MPC")
    axes[0, 1].set_title("tracking error [m]")
    axes[0, 1].legend()

    axes[1, 0].bar(
        ["PID avg", "PID rms", "MPC avg", "MPC rms"],
        [pid_e.mean(), np.sqrt((pid_e**2).mean()),
         mpc_e.mean(), np.sqrt((mpc_e**2).mean())],
    )
    axes[1, 0].set_title("error statistics [m]")

    axes[1, 1].plot(t, np.asarray(outs["pid_control"])[:, 0], label="PID thrust")
    axes[1, 1].plot(t, np.asarray(outs["mpc_control"])[:, 0], label="MPC thrust")
    axes[1, 1].set_title("thrust command")
    axes[1, 1].legend()

    fig.tight_layout()
    fig.savefig(save_path, dpi=110)
    plt.close(fig)
    return save_path
