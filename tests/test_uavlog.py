"""Streaming binary flight-log (io.uavlog + native/uavlog.cpp).

The rosbag-recording role (``run_mpc_velocity_control.sh:120-150``),
rebuilt native: these tests pin the format (native and pure-NumPy writers
byte-identical), streaming appends, crash-safety (torn final frame), and
the magic-dispatched integration with the flight-log analyzer.
"""

import numpy as np
import pytest

import unmanned_aerial_vehicles_tpu.io.uavlog as uavlog
from unmanned_aerial_vehicles_tpu.io import (
    UavLogWriter,
    analyze_flight_log,
    load_flight_log,
    read_uavlog,
    save_flight_log,
    write_uavlog,
)


@pytest.fixture
def force_fallback(monkeypatch):
    """Route io.uavlog through the pure-NumPy implementation."""
    monkeypatch.setattr(uavlog, "_lib", None)
    monkeypatch.setattr(uavlog, "_lib_failed", True)


def _write_stream(path, use_blocks=True):
    with UavLogWriter(path, {"state": 12, "thrust": 1, "pos_ref": 3}) as w:
        rng = np.random.default_rng(0)
        for i in range(5):
            w.append({
                "state": rng.normal(size=12),
                "thrust": 0.7 + 0.01 * i,
                "pos_ref": rng.normal(size=3),
            })
        if use_blocks:
            w.append({
                "state": rng.normal(size=(10, 12)),
                "thrust": rng.normal(size=10),
                "pos_ref": rng.normal(size=(10, 3)),
            })
        return w.frames


def test_stream_roundtrip_native(tmp_path):
    if not uavlog.native_available():
        pytest.skip("native toolchain unavailable")
    path = str(tmp_path / "run.uavlog")
    frames = _write_stream(path)
    assert frames == 15
    log = read_uavlog(path)
    assert log["state"].shape == (15, 12)
    assert log["thrust"].shape == (15,)
    assert log["pos_ref"].shape == (15, 3)
    np.testing.assert_allclose(log["thrust"][:5],
                               0.7 + 0.01 * np.arange(5), rtol=1e-6)


def test_fallback_writes_identical_bytes(tmp_path, force_fallback):
    path_fb = str(tmp_path / "fb.uavlog")
    _write_stream(path_fb)
    with open(path_fb, "rb") as f:
        fb_bytes = f.read()
    assert fb_bytes.startswith(uavlog.MAGIC)

    # reader (fallback) roundtrip
    log = read_uavlog(path_fb)
    assert log["state"].shape == (15, 12)

    # if the native library is buildable, it must produce the same bytes
    uavlog._lib_failed = False
    uavlog._lib = None
    if uavlog.native_available():
        path_nat = str(tmp_path / "nat.uavlog")
        _write_stream(path_nat)
        with open(path_nat, "rb") as f:
            assert f.read() == fb_bytes
        # cross-reads: native reader on fallback file
        log2 = read_uavlog(path_fb)
        np.testing.assert_array_equal(log2["state"], log["state"])


def test_torn_final_frame_dropped(tmp_path):
    path = str(tmp_path / "torn.uavlog")
    _write_stream(path)
    with open(path, "rb") as f:
        data = f.read()
    with open(path, "wb") as f:
        f.write(data[:-6])  # tear the last frame mid-float
    log = read_uavlog(path)
    assert log["state"].shape[0] == 14


def test_rollout_dump_and_analyzer_dispatch(tmp_path):
    T = 40
    rng = np.random.default_rng(1)
    outs = {
        "state": rng.normal(size=(T, 12)),
        "pos_ref": rng.normal(size=(T, 3)),
        "thrust": rng.uniform(0.3, 1.0, size=T),
        "final_state": rng.normal(size=12),   # run-level: skipped in uavlog
    }
    path = str(tmp_path / "flight.uavlog")
    save_flight_log(path, outs)
    log = load_flight_log(path)   # dispatched on magic, not extension
    assert "final_state" not in log
    m = analyze_flight_log(log)
    assert np.isfinite(m["rms_pos"])

    # npz path still carries run-level entries
    path_npz = str(tmp_path / "flight.npz")
    save_flight_log(path_npz, outs)
    log_npz = load_flight_log(path_npz)
    assert "final_state" in log_npz
    np.testing.assert_allclose(
        analyze_flight_log(log_npz)["rms_pos"], m["rms_pos"],
        rtol=1e-6,
    )


def test_writer_validation(tmp_path):
    path = str(tmp_path / "bad.uavlog")
    with pytest.raises(ValueError):
        UavLogWriter(path, {"a:b": 3})
    with pytest.raises(ValueError):
        UavLogWriter(path, {"a": 0})
    with pytest.raises(ValueError):
        write_uavlog(path, {"thrust": np.zeros(10)})  # no 'state'
    with UavLogWriter(path, {"state": 12}) as w:
        with pytest.raises(ValueError):
            w.append({"state": np.zeros(7)})
        with pytest.raises(KeyError):
            w.append({"wrong": np.zeros(12)})


def test_not_a_uavlog_error(tmp_path):
    path = str(tmp_path / "junk.bin")
    with open(path, "wb") as f:
        f.write(b"NOTALOG!" + b"\x00" * 64)
    with pytest.raises(ValueError):
        read_uavlog(path)
