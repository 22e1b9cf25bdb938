"""Rectangular window_size orientation — the (w, h) -> (rows, cols) reversal.

The reference reverses a ``(w, h)`` window exactly ONCE to (rows, cols)
(reference: src/PawsomeTracker.jl:70-72) and derives ``radii = window .÷ 2``
from the result (:44). A double application transposes rectangular windows,
which a spiral-RMSE oracle cannot see (it is orientation-insensitive). These
tests can: they assert the delivered spec directly through the public paths,
and track a target moving fast along exactly one axis with a strongly
rectangular window such that the TRANSPOSED window loses the target.
"""

import numpy as np
import pytest

import pawsometracker_tpu.api as api_mod
from pawsometracker_tpu import IJ, track
from pawsometracker_tpu.models.dog_tracker import make_spec
from pawsometracker_tpu.ops.dog_kernel import fix_window_size

import helpers


def _record_specs(monkeypatch, module):
    """Wrap ``module.make_spec`` to record every spec built through it."""
    seen = []

    def recording_make_spec(frame_shape, window_size, target_width, darker_target):
        spec = make_spec(frame_shape, window_size, target_width, darker_target)
        seen.append(spec)
        return spec

    monkeypatch.setattr(module, "make_spec", recording_make_spec)
    return seen


def _fast_horizontal_video(tmp_path, *, ncols=400, nrows=100, step=6, nframes=50):
    """Target sweeping +``step`` columns per frame at a constant row."""
    path = [(50, 30 + step * t) for t in range(nframes)]
    frames = [
        helpers.render_frame(nrows, ncols, ij, target_width=7, darker_target=True)
        for ij in path
    ]
    file = helpers.write_video(frames, str(tmp_path / "fastx"), fps=24)
    return file, path


def test_make_spec_does_not_renormalize():
    # single point of truth: fix_window_size reverses, make_spec preserves
    assert fix_window_size((31, 21)) == (21, 31)
    spec = make_spec((100, 100), fix_window_size((31, 21)), 10, True)
    assert spec.window_size == (21, 31)
    assert spec.radii == (10, 15)
    # make_spec alone must NOT reverse a (rows, cols) pair
    assert make_spec((100, 100), (9, 61), 7, True).window_size == (9, 61)


def test_public_track_delivers_reference_orientation(tmp_path, monkeypatch):
    # user (w, h) = (61, 9) must arrive as (rows, cols) = (9, 61), exactly
    # like the reference's fix_window_size + radii derivation
    seen = _record_specs(monkeypatch, api_mod)
    file, _ = _fast_horizontal_video(tmp_path)
    track(file, start_location=IJ(50, 30), window_size=(61, 9), target_width=7)
    assert seen, "public path did not build a spec"
    assert all(s.window_size == (9, 61) for s in seen), [s.window_size for s in seen]


def test_rectangular_window_tracks_fast_axis_motion(tmp_path):
    """6 px/frame horizontal motion; (w, h) = (61, 9) gives a ±30-column
    window that keeps up. The transposed (9, 61) window has only ±4 columns
    and provably loses the target (see companion loss assertion below)."""
    file, path = _fast_horizontal_video(tmp_path)
    _, tracked = track(file, start_location=IJ(50, 30), window_size=(61, 9), target_width=7)
    errs = [np.hypot(t[0] - p[0], t[1] - p[1]) for t, p in zip(tracked, path)]
    assert max(errs) < 2.0, f"lost the target: max err {max(errs):.1f} px"
    # and it really reached the far end of the sweep
    assert tracked[-1][1] > 300


def test_transposed_window_would_lose_the_target(tmp_path):
    """Sensitivity check: the same video tracked with the TRANSPOSED public
    window (w, h) = (9, 61) — i.e. ±4 columns of search — must lose the
    horizontally-moving target. This pins that the companion test above can
    actually detect a future re-introduction of the double-normalization."""
    file, path = _fast_horizontal_video(tmp_path)
    _, tracked = track(file, start_location=IJ(50, 30), window_size=(9, 61), target_width=7)
    final_err = np.hypot(tracked[-1][0] - path[-1][0], tracked[-1][1] - path[-1][1])
    assert final_err > 50, (
        f"transposed window unexpectedly kept up (err {final_err:.1f} px); "
        "the orientation test has lost its sensitivity"
    )


def test_batch_and_multi_deliver_reference_orientation(tmp_path, monkeypatch):
    import pawsometracker_tpu.batch as batch_mod
    import pawsometracker_tpu.multi as multi_mod
    from pawsometracker_tpu.batch import track_batch
    from pawsometracker_tpu.multi import track_multi

    file, _ = _fast_horizontal_video(tmp_path, nframes=12)

    seen_b = _record_specs(monkeypatch, batch_mod)
    track_batch([file], start_location=IJ(50, 30), window_size=(61, 9), target_width=7)
    assert seen_b and all(s.window_size == (9, 61) for s in seen_b), [
        s.window_size for s in seen_b
    ]

    seen_m = _record_specs(monkeypatch, multi_mod)
    track_multi(file, start_locations=[IJ(50, 30)], window_size=(61, 9), target_width=7)
    assert seen_m and all(s.window_size == (9, 61) for s in seen_m), [
        s.window_size for s in seen_m
    ]


@pytest.mark.parametrize("window_size", [(61, 9), (9, 61)])
def test_rectangular_window_rmse_oracle_still_passes(tmp_path, window_size):
    # the spiral oracle stays green for both orientations (slow motion);
    # kept so the matrix continues to exercise rectangular shapes end-to-end
    assert helpers.compare(tmp_path, start_location=IJ(50, 50), window_size=window_size) < 1.0
