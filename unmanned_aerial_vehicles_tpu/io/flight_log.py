"""Flight-log recording and post-hoc analysis (the rosbag-analyzer role).

The reference records every run as a rosbag with an explicit topic list
(``/root/reference/run_mpc_velocity_control.sh:120-150``) and extracts
metrics afterwards with sqlite queries + NumPy
(``src/px4/enhanced_plot_mpc_bag.py:446-998``). Here a "bag" is the stacked
output dict of a fused rollout — saved as one npz, loaded as arrays, and
analysed with the same metric formulas (``metrics.tracking``). No message
decoding, no time alignment: signals are tick-synchronous by construction.
"""

from __future__ import annotations

import numpy as np

from ..metrics.tracking import tracking_metrics


def save_flight_log(path: str, outs: dict, **metadata):
    """Persist a rollout-output dict (+ scalar metadata).

    ``.uavlog`` paths use the streaming binary format (``io.uavlog``,
    per-tick channels only — the native recorder's role); anything else is
    one compressed npz (whole-dict snapshot, run-level entries included).
    """
    if path.endswith(".uavlog"):
        from .uavlog import write_uavlog

        write_uavlog(path, outs)
        return
    arrays = {k: np.asarray(v) for k, v in outs.items()}
    for k, v in metadata.items():
        arrays[f"meta_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_flight_log(path: str) -> dict:
    """Load either format — dispatched on the file magic, not the name."""
    from .uavlog import MAGIC, read_uavlog

    with open(path, "rb") as f:
        magic = f.read(8)
    if magic == MAGIC:
        return read_uavlog(path)
    data = np.load(path)
    return {k: data[k] for k in data.files}


def analyze_flight_log(log: dict) -> dict:
    """``compute_metrics`` equivalent (``enhanced_plot_mpc_bag.py:640-722``)
    on a saved rollout: RMS/max position error, RMS velocity error, attitude
    RMSE (deg), thrust saturation %."""
    state = np.asarray(log["state"])
    kwargs = {}
    if "vel_ref" in log:
        kwargs["vel_setpoint"] = log["vel_ref"]
        kwargs["vel_current"] = state[..., 3:6]
    if "att_ref" in log:
        kwargs["att_setpoint"] = log["att_ref"]
        kwargs["att_current"] = state[..., 6:9]
    if "thrust" in log:
        kwargs["thrust_normalized"] = log["thrust"]
    m = tracking_metrics(log["pos_ref"], state[..., 0:3], **kwargs)
    return {k: float(v) for k, v in m.items()}
