"""Checkpoint/resume: an interrupted run resumed from its checkpoint must
reproduce the uninterrupted trajectory."""

import numpy as np

from pawsometracker_tpu import IJ, track
from pawsometracker_tpu.checkpoint import load_checkpoint, track_resumable

import helpers


def _make(tmp_path, seed=31):
    rng = np.random.default_rng(seed)
    _, tra = helpers.build_trajectory(30, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra, str(tmp_path), 24, 100, 100, 10, True)
    return f, tra


def test_resumable_matches_single_run(tmp_path):
    f, tra = _make(tmp_path)
    cp = str(tmp_path / "state.npz")
    ts_r, ij_r = track_resumable(
        f, checkpoint_path=cp, fps=24, checkpoint_every=2.0, start_location=IJ(50, 50),
        target_width=10,
    )
    ts_s, ij_s = track(f, fps=24, start_location=IJ(50, 50), target_width=10)
    assert len(ij_r) == len(ij_s)
    np.testing.assert_array_equal(ij_r, ij_s)
    # timestamps come from the single-run linspace grid — exactly equal
    np.testing.assert_array_equal(ts_r, ts_s)
    state = load_checkpoint(cp)
    assert state["done"]


def test_interrupt_and_resume(tmp_path):
    f, tra = _make(tmp_path, seed=32)
    cp = str(tmp_path / "state.npz")
    # "crash" after 2 slices (4 s of a 10 s video)
    ts_p, ij_p = track_resumable(
        f, checkpoint_path=cp, fps=24, checkpoint_every=2.0, start_location=IJ(50, 50),
        target_width=10, _max_slices=2,
    )
    assert len(ij_p) == 96  # 2 slices x 48 frames
    state = load_checkpoint(cp)
    assert not state["done"]
    assert state["next_time"] == 4.0
    # resume to completion
    ts_r, ij_r = track_resumable(
        f, checkpoint_path=cp, fps=24, checkpoint_every=2.0, target_width=10,
    )
    ts_s, ij_s = track(f, fps=24, start_location=IJ(50, 50), target_width=10)
    assert len(ij_r) == len(ij_s)
    np.testing.assert_array_equal(ij_r, ij_s)
    np.testing.assert_array_equal(ts_r, ts_s)
    # RMSE vs ground truth still sub-pixel
    m = min(len(tra), len(ij_r))
    rmse = np.sqrt(np.mean(np.sum((np.asarray(ij_r[:m]) - np.asarray(tra[:m])) ** 2, axis=1)))
    assert rmse < 1.0


def test_completed_checkpoint_short_circuits(tmp_path):
    f, _ = _make(tmp_path, seed=33)
    cp = str(tmp_path / "state.npz")
    ts1, ij1 = track_resumable(
        f, checkpoint_path=cp, fps=24, checkpoint_every=3.0, start_location=IJ(50, 50),
        target_width=10,
    )
    # second call returns the stored result without re-decoding
    ts2, ij2 = track_resumable(f, checkpoint_path=cp, fps=24, target_width=10)
    np.testing.assert_array_equal(ij1, ij2)
    np.testing.assert_allclose(ts1, ts2)


def test_corrupt_checkpoint_recovers(tmp_path, caplog):
    """A corrupt/truncated checkpoint (power loss mid-write) must not brick
    resume: it is quarantined with a warning and tracking restarts (review
    finding on load_checkpoint)."""
    import logging

    f, tra = _make(tmp_path)
    cp = str(tmp_path / "cp.npz")
    with open(cp, "wb") as fh:
        fh.write(b"\x00garbage not a zipfile")
    with caplog.at_level(logging.WARNING, logger="pawsometracker_tpu.checkpoint"):
        assert load_checkpoint(cp) is None
    assert "unreadable" in caplog.text
    assert (tmp_path / "cp.npz.corrupt").exists()
    # and a full resumable run now proceeds from scratch
    ts, ij = track_resumable(f, checkpoint_path=cp, fps=24,
                             start_location=IJ(50, 50), target_width=10)
    assert len(ts) == len(ij) > 0


def test_isolated_slices_match_in_process(tmp_path):
    """isolate_slices=True (each slice's track() in a spawned subprocess —
    the bounded-memory mode for the leaky tunnel client, docs/deployment.md)
    must produce bit-identical results to the in-process run."""
    f, tra = _make(tmp_path)
    kw = dict(fps=24, start_location=IJ(50, 50), target_width=10,
              checkpoint_every=0.5)
    ts_in, ij_in = track_resumable(
        f, checkpoint_path=str(tmp_path / "in.npz"), **kw
    )
    ts_iso, ij_iso = track_resumable(
        f, checkpoint_path=str(tmp_path / "iso.npz"), isolate_slices=True, **kw
    )
    np.testing.assert_array_equal(ij_iso, ij_in)
    np.testing.assert_allclose(ts_iso, ts_in)


def test_isolated_slices_reject_frame_arrays():
    import pytest

    frames = np.zeros((4, 32, 32), np.uint8)
    with pytest.raises(ValueError, match="isolate_slices"):
        track_resumable(frames, checkpoint_path="/tmp/x.npz",
                        isolate_slices=True, input_fps=24)
