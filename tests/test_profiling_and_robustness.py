"""Aux subsystems: profiling hooks, logging, robustness to malformed inputs."""

import logging
import os

import numpy as np
import pytest

from pawsometracker_tpu import IJ, track
from pawsometracker_tpu.utils.profiling import Timer, annotate, trace

import helpers


def test_timer_sections():
    t = Timer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    with t.section("b"):
        pass
    assert set(t.totals) == {"a", "b"}
    assert t.totals["a"] >= 0


def test_trace_smoke(tmp_path):
    import jax.numpy as jnp

    with trace(str(tmp_path / "prof")):
        with annotate("tracked-section"):
            (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    # a trace directory with at least one event file appears
    found = any(f for _, _, fs in os.walk(tmp_path / "prof") for f in fs)
    assert found


def test_pipeline_section_logging(tmp_path, caplog):
    rng = np.random.default_rng(41)
    _, tra = helpers.build_trajectory(25, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra[:48], str(tmp_path), 24, 100, 100, 10, True)
    with caplog.at_level(logging.DEBUG, logger="pawsometracker_tpu"):
        track(f, fps=24, start_location=IJ(50, 50), target_width=10)
    msgs = [r.message for r in caplog.records if "sections=" in r.message]
    assert msgs, "pipeline section timing log missing"
    assert "device" in msgs[-1]


def test_corrupt_file_raises(tmp_path):
    bad = tmp_path / "garbage.mp4"
    bad.write_bytes(b"\x00" * 4096)
    with pytest.raises(IOError):
        track(str(bad))


def test_truncated_video_truncates_output(tmp_path):
    """EOF mid-request: outputs truncate to frames actually read
    (reference: src/PawsomeTracker.jl:162,173)."""
    rng = np.random.default_rng(42)
    _, tra = helpers.build_trajectory(25, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra[:60], str(tmp_path), 24, 100, 100, 10, True)
    # ask for 10 s but the video has only 2.5 s
    ts, ij = track(f, fps=24, stop=10.0, start_location=IJ(50, 50), target_width=10)
    assert len(ts) == len(ij) == 60


def test_pathlib_path_accepted(tmp_path):
    from pathlib import Path

    rng = np.random.default_rng(43)
    _, tra = helpers.build_trajectory(25, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra[:30], str(tmp_path), 24, 100, 100, 10, True)
    ts, ij = track(Path(f), fps=24, start_location=IJ(50, 50), target_width=10)
    assert len(ij) == 30


def test_window_larger_than_frame(tmp_path):
    """A search window larger than the frame degenerates gracefully to
    whole-frame search (generous padding, clamped positions)."""
    rng = np.random.default_rng(131)
    _, tra = helpers.build_trajectory(20, 24, (30, 30), rng)
    f = helpers.trajectory2video(tra[:24], str(tmp_path), 24, 60, 60, 8, True)
    from pawsometracker_tpu import IJ, track

    ts, ij = track(f, fps=24, start_location=IJ(30, 30), target_width=8, window_size=130)
    assert len(ij) == 24
    assert (ij >= 0).all() and (ij < 60).all()
    err = np.linalg.norm(np.asarray(ij) - np.asarray(tra[:24]), axis=1)
    assert np.sqrt(np.mean(err**2)) < 1.5


def test_single_file_list(tmp_path):
    """A one-element list takes the segmented path and matches the scalar call."""
    rng = np.random.default_rng(132)
    _, tra = helpers.build_trajectory(25, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra[:30], str(tmp_path), 24, 100, 100, 10, True)
    ts_a, ij_a = track([f], fps=24, start_location=[IJ(50, 50)], target_width=10)
    ts_b, ij_b = track(f, fps=24, start_location=IJ(50, 50), target_width=10)
    np.testing.assert_array_equal(ij_a, ij_b)


def test_native_encoder_odd_dims_rejected(tmp_path):
    """libx264 4:2:0 requires even dimensions; the encoder fails cleanly."""
    from pawsometracker_tpu.io import native_io

    if not native_io.native_available():
        pytest.skip("native lib unavailable")
    with pytest.raises(IOError):
        native_io.NativeVideoWriter(str(tmp_path / "odd.mp4"), 641, 361, 24)


def test_one_frame_video(tmp_path):
    """A single-frame video yields exactly the snap position."""
    frame = np.full((80, 80), 128, np.uint8)
    import cv2

    cv2.circle(frame, (40, 30), 5, 0, -1)
    f = helpers.write_video([frame], str(tmp_path / "one"), 24)
    ts, ij = track(f, fps=24, start_location=IJ(30, 40), target_width=10)
    assert len(ij) == 1
    assert abs(ij[0][0] - 30) <= 1 and abs(ij[0][1] - 40) <= 1
