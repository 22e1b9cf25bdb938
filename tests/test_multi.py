"""Multi-target tracking over one frame stream."""

import cv2
import numpy as np
import pytest

from pawsometracker_tpu import IJ, track
from pawsometracker_tpu.multi import track_multi

import helpers


def make_two_target_video(tmp_path, T=60, h=120, w=160):
    paths = [[(30 + t // 2, 30 + t) for t in range(T)], [(90 - t // 3, 130 - t) for t in range(T)]]
    frames = []
    for t in range(T):
        f = np.full((h, w), 128, np.uint8)
        for p in paths:
            cv2.circle(f, (p[t][1], p[t][0]), 5, 0, -1)
        frames.append(f)
    return helpers.write_video(frames, str(tmp_path / "two"), 24), paths


def test_track_multi_two_targets(tmp_path):
    f, paths = make_two_target_video(tmp_path)
    ts, pos = track_multi(
        f, [IJ(*paths[0][0]), IJ(*paths[1][0])], fps=24, target_width=10, chunk_size=16
    )
    assert pos.shape == (60, 2, 2)
    for k, p in enumerate(paths):
        err = np.linalg.norm(pos[:, k, :] - np.asarray(p), axis=1)
        assert np.sqrt(np.mean(err**2)) < 1.0, f"target {k}"


def test_track_multi_matches_single(tmp_path):
    """One-target track_multi must equal track() exactly."""
    rng = np.random.default_rng(101)
    _, tra = helpers.build_trajectory(25, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra[:48], str(tmp_path), 24, 100, 100, 10, True)
    ts_m, pos_m = track_multi(f, [IJ(50, 50)], fps=24, target_width=10)
    ts_s, pos_s = track(f, fps=24, start_location=IJ(50, 50), target_width=10, stream="full")
    np.testing.assert_array_equal(pos_m[:, 0, :], pos_s)


def test_track_multi_requires_locations(tmp_path):
    with pytest.raises(ValueError):
        track_multi("whatever.mp4", [])


@pytest.mark.parametrize("depth", [0, 2])
def test_track_multi_roi_matches_full(tmp_path, depth):
    """Multi-target ROI pipeline (per-target speculative crops, vmapped
    bounded scans) must equal full-frame streaming bit-for-bit."""
    T, h, w = 50, 360, 480
    paths = [
        [(80 + t, 90 + 2 * t) for t in range(T)],
        [(300 - 2 * t, 400 - 3 * t) for t in range(T)],
        [(180, 60 + 4 * t) for t in range(T)],
    ]
    frames = []
    for t in range(T):
        f = np.full((h, w), 128, np.uint8)
        for p in paths:
            cv2.circle(f, (p[t][1], p[t][0]), 5, 0, -1)
        frames.append(f)
    f = helpers.write_video(frames, str(tmp_path / "three"), 24)
    locs = [IJ(*p[0]) for p in paths]
    kw = dict(fps=24, target_width=10, window_size=21)
    _, pos_full = track_multi(f, locs, stream="full", **kw)
    _, pos_roi = track_multi(f, locs, stream="roi", roi_frames=4, pipeline_depth=depth, **kw)
    np.testing.assert_array_equal(pos_roi, pos_full)
    for k, p in enumerate(paths):
        err = np.linalg.norm(pos_roi[:, k, :] - np.asarray(p), axis=1)
        assert np.sqrt(np.mean(err**2)) < 1.0, f"target {k}"


def test_multi_autodetect_peaks(tmp_path):
    """start_locations=None + n_targets: the N strongest DoG peaks seed the
    trackers (strongest-first), and tracking matches an explicit-locations
    run on the same clip."""
    import cv2

    from pawsometracker_tpu.multi import track_multi

    h, w, T = 140, 200, 30
    starts = [(30, 40), (100, 150), (70, 100)]
    frames = []
    for t in range(T):
        f = np.full((h, w), 128, np.uint8)
        for s, (i0, j0) in enumerate(starts):
            cv2.circle(f, (j0 + t, i0 + (t if s % 2 else -t) // 2), 5, 0, -1)
        frames.append(f)
    path = helpers.write_video(frames, str(tmp_path / "auto"), 24, codec="FFV1")

    ts, pos = track_multi(path, n_targets=3, target_width=10, fps=24)
    assert pos.shape[1] == 3
    # every seeded track starts on one of the true blobs (within a couple px)
    first = {tuple(p) for p in pos[0]}
    for i0, j0 in starts:
        assert any(abs(a - i0) <= 2 and abs(b - j0) <= 2 for a, b in first), (i0, j0)
    # equality with explicit locations (same order as detected)
    from pawsometracker_tpu import IJ

    locs = [IJ(int(a), int(b)) for a, b in pos[0]]
    ts2, pos2 = track_multi(path, locs, target_width=10, fps=24)
    np.testing.assert_array_equal(pos2, pos)


def test_multi_autodetect_requires_n(tmp_path):
    from pawsometracker_tpu.multi import track_multi

    frames = [np.full((64, 96), 128, np.uint8)] * 5
    path = helpers.write_video(frames, str(tmp_path / "x"), 24, codec="FFV1")
    with pytest.raises(ValueError):
        track_multi(path)


def test_multi_autodetect_conflicting_args_rejected(tmp_path):
    from pawsometracker_tpu import IJ
    from pawsometracker_tpu.multi import track_multi

    frames = [np.full((64, 96), 128, np.uint8)] * 5
    path = helpers.write_video(frames, str(tmp_path / "x"), 24, codec="FFV1")
    with pytest.raises(ValueError):
        track_multi(path, [IJ(10, 10)], n_targets=3)
    with pytest.raises(ValueError):
        track_multi(path, [IJ(10, 10)], min_distance=40)


def test_multi_autodetect_exhausted_peaks_rejected(tmp_path):
    """min_distance covering the whole frame cannot yield 3 separable peaks:
    a clear error instead of duplicate corner-pinned trackers."""
    import cv2

    from pawsometracker_tpu.multi import track_multi

    frames = []
    for t in range(5):
        f = np.full((64, 96), 128, np.uint8)
        cv2.circle(f, (48, 32), 5, 0, -1)
        frames.append(f)
    path = helpers.write_video(frames, str(tmp_path / "one"), 24, codec="FFV1")
    with pytest.raises(ValueError, match="separable peaks"):
        track_multi(path, n_targets=3, min_distance=200, target_width=10)


@pytest.mark.parametrize("stream", ["roi", "full"])
def test_track_multi_diagnostic_overlay(tmp_path, stream):
    """diagnostic_file writes one shared 640x360 overlay (frames 2..n, like
    the single-target reference) with N markers/trails, on both the ROI
    pipeline and the full-frame path — and positions are unchanged."""
    f, paths = make_two_target_video(tmp_path)
    locs = [IJ(*paths[0][0]), IJ(*paths[1][0])]
    kw = dict(fps=24, target_width=10, chunk_size=16, stream=stream)
    ts0, pos0 = track_multi(f, locs, **kw)
    diag = str(tmp_path / f"diag_{stream}.mp4")
    ts1, pos1 = track_multi(f, locs, diagnostic_file=diag, **kw)
    np.testing.assert_array_equal(pos1, pos0)
    cap = cv2.VideoCapture(diag)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 59  # frames 2..60
    ok, fr = cap.read()
    cap.release()
    assert ok and fr.shape[:2] == (360, 640)
    # both targets' markers are drawn: the overlay differs from a plain
    # resize of the source frame near BOTH scaled target positions
    src = cv2.VideoCapture(f)
    src.read()  # frame 1 is not in the overlay
    ok, raw = src.read()
    src.release()
    gray = cv2.cvtColor(raw, cv2.COLOR_BGR2GRAY) if raw.ndim == 3 else raw
    plain = cv2.resize(gray, (640, 360))
    over = fr[..., 0] if fr.ndim == 3 else fr
    ry, rx = 360 / 120, 640 / 160
    for k in (0, 1):
        i, j = paths[k][1]
        si, sj = int(round(i * ry)), int(round(j * rx))
        patch_o = over[max(si - 4, 0) : si + 5, max(sj - 4, 0) : sj + 5].astype(int)
        patch_p = plain[max(si - 4, 0) : si + 5, max(sj - 4, 0) : sj + 5].astype(int)
        assert np.abs(patch_o - patch_p).max() > 30, f"marker {k} missing"


def test_track_multi_diagnostic_no_leak_on_open_failure(tmp_path):
    """A failed open must not leave a half-open overlay encoder behind
    (review finding: the writer was constructed before open_source)."""
    diag = str(tmp_path / "leak.mp4")
    with pytest.raises(IOError):
        track_multi("/nonexistent_video.mp4", [IJ(10, 10)], fps=24,
                    target_width=10, diagnostic_file=diag)
    assert not (tmp_path / "leak.mp4").exists()
