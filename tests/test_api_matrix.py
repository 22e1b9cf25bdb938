"""End-to-end integration matrix against synthetic ground-truth videos.

Port of the reference's released test strategy (SURVEY.md §4; reference
test/test-basic-test.jl:106-148): sweep fps, start_location kinds, frame size,
target width, polarity, aspect ratio, segments, diagnostics. Oracle: RMSE < 1
pixel vs the ground-truth spiral.
"""

import os

import numpy as np
import pytest

from pawsometracker_tpu import IJ, track

import helpers


def test_defaults_ij_start(tmp_path):
    # the reference Defaults snippet: fps=24, start=(50,50), 100x100, tw=10, darker
    assert helpers.compare(tmp_path, fps=24, start_location=IJ(50, 50)) < 1.0


@pytest.mark.parametrize("fps", [10, 24, 30])
def test_fps_sweep(tmp_path, fps):
    assert helpers.compare(tmp_path, fps=fps, start_location=IJ(50, 50)) < 1.0


@pytest.mark.parametrize(
    "start_location",
    [None, IJ(50, 50), (50, 50), IJ(30, 70), (70, 30)],
    ids=["auto", "ij-center", "xy-center", "ij-off", "xy-off"],
)
def test_start_location_kinds(tmp_path, start_location):
    assert helpers.compare(tmp_path, start_location=start_location) < 1.0


@pytest.mark.parametrize("w,h", [(100, 100), (160, 90), (90, 160)])
def test_frame_sizes(tmp_path, w, h):
    assert helpers.compare(tmp_path, w=w, h=h, start_location=None) < 1.0


@pytest.mark.parametrize("target_width", [6, 10, 20])
def test_target_widths(tmp_path, target_width):
    assert helpers.compare(tmp_path, target_width=target_width, start_location=IJ(50, 50)) < 1.0


@pytest.mark.parametrize("darker_target", [True, False])
def test_polarity(tmp_path, darker_target):
    assert helpers.compare(tmp_path, darker_target=darker_target, start_location=IJ(50, 50)) < 1.0


@pytest.mark.parametrize("aspect", [2, 0.5])
def test_aspect_ratio(tmp_path, aspect):
    # anamorphic squeeze: display (x, y) start + sar-corrected tracking
    assert (
        helpers.compare(
            tmp_path, aspect=aspect, start_location=(60, 50), w=200, h=100, target_width=12
        )
        < 1.0
    )


@pytest.mark.parametrize("window_size", [21, (31, 21), (21, 31)])
def test_window_size_kinds(tmp_path, window_size):
    assert (
        helpers.compare(tmp_path, start_location=IJ(50, 50), window_size=window_size) < 1.0
    )


@pytest.mark.parametrize("nsegments", [2, 3])
def test_segmented_videos(tmp_path, nsegments):
    # segment chaining: each segment resumes from the previous end position
    assert helpers.compare(tmp_path, nsegments=nsegments, start_location=IJ(50, 50)) < 1.0


def test_segmented_auto_start(tmp_path):
    assert helpers.compare(tmp_path, nsegments=2, start_location=None) < 1.0


def test_lossy_codec(tmp_path):
    # mp4v-compressed video still tracks under 1 px
    assert helpers.compare(tmp_path, start_location=IJ(50, 50), codec="mp4v") < 1.0


def test_diagnostic_file(tmp_path):
    # reference testitem "Diagnostic file generation"
    dia = str(tmp_path / "diag.mp4")
    rmse = helpers.compare(tmp_path, start_location=IJ(50, 50), diagnostic_file=dia)
    assert rmse < 1.0
    assert os.path.exists(dia) and os.path.getsize(dia) > 0
    import cv2

    cap = cv2.VideoCapture(dia)
    assert cap.isOpened()
    w = cap.get(cv2.CAP_PROP_FRAME_WIDTH)
    h = cap.get(cv2.CAP_PROP_FRAME_HEIGHT)
    nfr = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert (w, h) == (640, 360)
    # frame 1 only sets the scaling ratio; diagnostic video has frames 2..n
    # (reference: src/PawsomeTracker.jl:160-168)
    assert nfr == 240


def test_diagnostic_label_truetype(tmp_path):
    """The label renders with the BUNDLED TrueType face (reference bundles
    TeXGyreHerosMakie, src/PawsomeTracker.jl:21-24) at size 20, (20,20),
    left/top aligned — visible as overlay-color glyph pixels in that region."""
    from pawsometracker_tpu.diagnose import (
        FONT_PATH,
        LABEL_POS,
        LABEL_SIZE,
        _render_label,
    )

    assert os.path.exists(FONT_PATH)  # font ships with the package
    alpha = _render_label("diag")
    assert alpha is not None and alpha.max() == 1.0
    assert alpha.shape[0] <= 2 * LABEL_SIZE

    dia = str(tmp_path / "diag.mp4")
    helpers.compare(tmp_path, start_location=IJ(50, 50), diagnostic_file=dia)
    import cv2

    cap = cv2.VideoCapture(dia)
    ok, frame = cap.read()
    cap.release()
    assert ok
    g = frame[..., 0] if frame.ndim == 3 else frame
    r0, c0 = LABEL_POS
    region = g[r0 : r0 + alpha.shape[0], c0 : c0 + alpha.shape[1]].astype(float)
    # glyph cores (alpha ~ 1) must be near the overlay color (white: darker target)
    assert region[alpha > 0.9].mean() > 200
    # and the region isn't uniformly white — glyph structure survives encoding
    assert region[alpha < 0.1].mean() < 200


def test_no_diagnostic_file(tmp_path):
    helpers.compare(tmp_path, start_location=IJ(50, 50), diagnostic_file=None)
    assert not os.path.exists(str(tmp_path / "diag.mp4"))


def test_timestamps_length_convention(tmp_path):
    """ts = linspace(start, stop, n) truncated to frames read
    (reference: src/PawsomeTracker.jl:149-152,173)."""
    rng = np.random.default_rng(1)
    _, tra = helpers.build_trajectory(30, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra, str(tmp_path), 24, 100, 100, 10, True)
    ts, ij = track(f, fps=24, start_location=IJ(50, 50))
    assert len(ts) == len(ij) == len(tra)
    assert ts[0] == 0.0
    # step is (stop-start)/(n-1) with the default 24h stop: ~1/24 s
    assert ts[1] == pytest.approx(1 / 24, rel=1e-3)
    # explicit start/stop: ts spans [start, stop] inclusive by length
    ts2, ij2 = track(f, fps=24, start=0, stop=5, start_location=IJ(50, 50))
    n = round(24 * 5)
    assert len(ts2) <= n
    ref = np.linspace(0, 5, n)
    np.testing.assert_allclose(ts2, ref[: len(ts2)])


def test_start_stop_window(tmp_path):
    rng = np.random.default_rng(2)
    _, tra = helpers.build_trajectory(30, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra, str(tmp_path), 24, 100, 100, 10, True)
    # start mid-video: must begin near the mid-trajectory position -> give the
    # tracker the correct start location for that time
    k = 24 * 4
    ts, ij = track(f, fps=24, start=4.0, stop=8.0, start_location=IJ(*tra[k]))
    assert 90 <= len(ij) <= 97  # ~96 frames
    err = np.linalg.norm(np.asarray(ij[0]) - np.asarray(tra[k]))
    assert err < 3


def test_multifile_length_mismatch_raises(tmp_path):
    rng = np.random.default_rng(3)
    _, tra = helpers.build_trajectory(20, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra, str(tmp_path), 24, 100, 100, 10, True)
    with pytest.raises(ValueError, match="length mismatch"):
        track([f, f], start=[0.0], start_location=None)


def test_bad_file_raises():
    with pytest.raises(IOError):
        track("/nonexistent/video.mp4")


def test_merged_timestamps_uniform_step(tmp_path):
    """Multi-file ts = range from segment 1's step over the total length
    (reference: src/PawsomeTracker.jl:209-213)."""
    rng = np.random.default_rng(4)
    _, tra = helpers.build_trajectory(30, 24, (50, 50), rng)
    files = helpers.trajectory2video(tra, str(tmp_path), 24, 100, 100, 10, True, nsegments=2)
    ts, ij = track(files, fps=24, start_location=[IJ(50, 50), None])
    assert len(ts) == len(ij)
    steps = np.diff(ts)
    np.testing.assert_allclose(steps, steps[0])


def test_diagnostic_shared_across_segments(tmp_path):
    """Segmented tracking writes ONE shared diagnostic video
    (reference: src/PawsomeTracker.jl:201 — a single diagnose context wraps
    all segments; each segment contributes frames 2..n_i)."""
    import cv2

    rng = np.random.default_rng(121)
    _, tra = helpers.build_trajectory(30, 24, (50, 50), rng)
    files = helpers.trajectory2video(tra, str(tmp_path), 24, 100, 100, 10, True, nsegments=2)
    dia = str(tmp_path / "shared.mp4")
    ts, ij = track(files, fps=24, start_location=[IJ(50, 50), None], diagnostic_file=dia)
    cap = cv2.VideoCapture(dia)
    assert cap.isOpened()
    nfr = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    # sum over segments of (len_i - 1)
    assert nfr == len(ij) - 2


def test_ndarray_start_locations_accepted(tmp_path):
    """np.ndarray start locations are natural inputs (review finding: the
    Sequence check rejected them; multi's truthiness check crashed)."""
    from pawsometracker_tpu.multi import track_multi

    rng = np.random.default_rng(73)
    _, tra = helpers.build_trajectory(25, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra[:24], str(tmp_path), 24, 100, 100, 10, True)
    kw = dict(fps=24, target_width=10)
    ts_t, ij_t = track(f, start_location=(50.0, 50.0), **kw)
    ts_a, ij_a = track(f, start_location=np.array([50.0, 50.0]), **kw)
    np.testing.assert_array_equal(ij_a, ij_t)
    ts_m, pos_m = track_multi(f, np.array([[50.0, 50.0]]), **kw)
    np.testing.assert_array_equal(pos_m[:, 0, :], ij_t)


def test_single_location_broadcasts_over_segments(tmp_path):
    """One IJ/(x, y) for a segmented track seeds segment 1 only; later
    segments chain (review finding: list(IJ(3, 5)) unpacked into bogus
    scalar entries)."""
    rng = np.random.default_rng(74)
    _, tra = helpers.build_trajectory(25, 24, (50, 50), rng)
    d = tmp_path / "segs"
    d.mkdir()
    files = helpers.trajectory2video(tra[:48], str(d), 24, 100, 100, 10, True,
                                     nsegments=2)
    ts_l, ij_l = track(files, start_location=[IJ(50, 50), None], fps=24,
                       target_width=10)
    ts_s, ij_s = track(files, start_location=IJ(50, 50), fps=24,
                       target_width=10)
    np.testing.assert_array_equal(ij_s, ij_l)


def test_enum_kwargs_validated(tmp_path):
    """Typos in stream/speculate/backend/engine raise instead of silently
    degrading (review finding)."""
    rng = np.random.default_rng(75)
    _, tra = helpers.build_trajectory(25, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra[:12], str(tmp_path), 24, 100, 100, 10, True)
    for kw in ({"stream": "ROI"}, {"speculate": "contian"},
               {"backend": "ffmpeg"}, {"engine": "cuda"}):
        with pytest.raises(ValueError, match="must be one of"):
            track(f, start_location=IJ(50, 50), target_width=10, **kw)


def test_enum_kwargs_validated_batch_multi(tmp_path):
    """Same typo protection on track_batch and track_multi."""
    from pawsometracker_tpu.batch import track_batch
    from pawsometracker_tpu.multi import track_multi

    rng = np.random.default_rng(76)
    _, tra = helpers.build_trajectory(25, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra[:12], str(tmp_path), 24, 100, 100, 10, True)
    with pytest.raises(ValueError, match="must be one of"):
        track_batch([f], start_location=IJ(50, 50), target_width=10, stream="ROI")
    with pytest.raises(ValueError, match="must be one of"):
        track_multi(f, [IJ(50, 50)], target_width=10, engine="cuda")


@pytest.mark.parametrize("stream", ["roi", "full"])
def test_progress_callback(tmp_path, stream):
    """progress(frames_done, frames_expected) fires monotonically per chunk
    on both stream paths, ending at the delivered frame count."""
    rng = np.random.default_rng(78)
    _, tra = helpers.build_trajectory(25, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra[:48], str(tmp_path), 24, 100, 100, 10, True)
    calls = []
    ts, ij = track(f, start_location=IJ(50, 50), target_width=10,
                   stream=stream, chunk_size=16, roi_frames=4,
                   progress=lambda d, t: calls.append((d, t)))
    assert calls, "progress never fired"
    dones = [d for d, _ in calls]
    assert dones == sorted(dones)
    assert dones[-1] == len(ij) - 1  # frames tracked past frame 1
    assert all(t == calls[0][1] for _, t in calls)  # stable total


def test_progress_callback_batch_and_multi(tmp_path):
    """track_batch aggregates progress across all videos; track_multi
    reports stream frames (both estimate totals from container counts)."""
    from pawsometracker_tpu.batch import track_batch
    from pawsometracker_tpu.multi import track_multi

    rng = np.random.default_rng(79)
    _, tra = helpers.build_trajectory(25, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra[:32], str(tmp_path), 24, 100, 100, 10, True)
    calls = []
    track_batch([f, f], start_location=IJ(50, 50), target_width=10,
                chunk_size=16, progress=lambda d, t: calls.append((d, t)))
    assert calls and calls[-1] == (2 * 31, 2 * 31)
    dones = [d for d, _ in calls]
    assert dones == sorted(dones)
    calls2 = []
    track_multi(f, [IJ(50, 50), IJ(52, 52)], target_width=10, chunk_size=16,
                progress=lambda d, t: calls2.append((d, t)))
    assert calls2 and calls2[-1] == (31, 31)
