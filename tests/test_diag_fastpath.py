"""Diagnostics on the native ROI fast path.

With ``diagnostic_file`` set, the speculative pipeline must KEEP the C++
retained decode ring (crops cut in C++, full frames never copied into Python)
and feed the overlay writer from zero-copy retained-frame views at drain time
— with positions bit-identical to a no-diagnostics run and the overlay video
byte-equal to the full-frame fallback writer's output. (Round-4 VERDICT #1:
the ~10x perf cliff when diagnostics were enabled.) Reference overlay
semantics: src/diagnose.jl:30-38.
"""

import hashlib
import pathlib

import cv2
import numpy as np
import pytest

from pawsometracker_tpu import IJ, track
from pawsometracker_tpu import pipeline
from pawsometracker_tpu.io import native_io

import helpers

pytestmark = pytest.mark.skipif(
    not native_io.native_available()
    or not hasattr(native_io._load(), "pawsio_retained_ptr"),
    reason="native decoder with retained-frame views unavailable",
)


from contextlib import contextmanager


@contextmanager
def views_disabled():
    """Disable zero-copy retained views -> the pre-round-5 full-frame
    fallback delivery (prefetcher + Python crops + per-frame dia)."""
    orig = native_io.NativeFrameSource._finish_open

    def patched(self, lib, info, prefetch):
        orig(self, lib, info, prefetch)
        self.can_view_retained = False

    native_io.NativeFrameSource._finish_open = patched
    try:
        yield
    finally:
        native_io.NativeFrameSource._finish_open = orig


@pytest.fixture
def no_views(monkeypatch):
    orig = native_io.NativeFrameSource._finish_open

    def patched(self, lib, info, prefetch):
        orig(self, lib, info, prefetch)
        self.can_view_retained = False

    monkeypatch.setattr(native_io.NativeFrameSource, "_finish_open", patched)


@pytest.fixture
def spy_single(monkeypatch):
    """Record (use_native_retained, keep_for_dia) per SingleVideoSource."""
    flags = []
    orig = pipeline.SingleVideoSource.__init__

    def spy(self, *a, **kw):
        orig(self, *a, **kw)
        flags.append((self.use_native_retained, self.keep_for_dia))

    monkeypatch.setattr(pipeline.SingleVideoSource, "__init__", spy)
    return flags


def _decoded_frames(p):
    cap = cv2.VideoCapture(p)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2GRAY))
    cap.release()
    return np.stack(frames)


def test_retained_frame_view_matches_read(tmp_path):
    frames = [helpers.render_frame(64, 96, (20 + t, 30 + t), 8, True) for t in range(12)]
    f = helpers.write_video(frames, str(tmp_path / "v"), 24)
    with native_io.NativeFrameSource(f, fps=24, prefetch=0) as plain:
        want = plain.read_chunk(12).copy()
    with native_io.NativeFrameSource(f, fps=24, prefetch=16) as src:
        assert src.can_view_retained
        k = src.advance_retained(6)
        assert k == 6
        for i in range(k):
            v = src.retained_frame(i)
            assert v.shape == (64, 96)
            np.testing.assert_array_equal(np.asarray(v), want[i])
        # views alias the ring: no copy was made
        assert not v.flags["OWNDATA"]
        with pytest.raises(IOError):
            src.retained_frame(k)  # beyond the retained window
        src.release(k)


def test_dia_stays_on_fast_path_and_is_byte_equal(tmp_path, spy_single):
    rng = np.random.default_rng(51)
    _, tra = helpers.build_trajectory(28, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra, str(tmp_path), 24, 160, 120, 10, True)
    kw = dict(fps=24, start_location=IJ(50, 50), target_width=10,
              stream="roi", roi_frames=4, pipeline_depth=2)

    _, ij_plain = track(f, **kw)

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    # same basename in both dirs: the overlay label is the OUTPUT basename
    dia_fast = str(tmp_path / "a" / "diag.mp4")
    dia_slow = str(tmp_path / "b" / "diag.mp4")

    _, ij_fast = track(f, diagnostic_file=dia_fast, **kw)
    assert spy_single[-1] == (True, True)  # dia rode the native retained ring
    np.testing.assert_array_equal(ij_fast, ij_plain)

    ov = _decoded_frames(dia_fast)
    assert ov.shape == (len(ij_plain) - 1, 360, 640)  # frames 2..n only

    return_fast = pathlib.Path(dia_fast).read_bytes()
    # fallback (views disabled) must produce the same bytes — separate block
    # so the monkeypatch scopes correctly
    with views_disabled():
        _, ij_slow = track(f, diagnostic_file=dia_slow, **kw)
    assert spy_single[-1][0] is False  # fallback really took the slow delivery
    np.testing.assert_array_equal(ij_slow, ij_plain)
    assert hashlib.sha256(return_fast).hexdigest() == hashlib.sha256(
        pathlib.Path(dia_slow).read_bytes()
    ).hexdigest()


def test_dia_fallback_when_views_unavailable(tmp_path, spy_single, no_views):
    """A stale .so without retained views must silently take the full-frame
    fallback delivery and still track + overlay correctly."""
    rng = np.random.default_rng(53)
    _, tra = helpers.build_trajectory(24, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra, str(tmp_path), 24, 120, 100, 10, True)
    dia = str(tmp_path / "diag.mp4")
    _, ij = track(f, fps=24, start_location=IJ(50, 50), target_width=10,
                  stream="roi", roi_frames=4, pipeline_depth=2,
                  diagnostic_file=dia)
    assert spy_single[-1][0] is False  # fallback delivery
    assert _decoded_frames(dia).shape[0] == len(ij) - 1


def test_dia_fast_path_replays_byte_equal(tmp_path, spy_single):
    h, w, T = 200, 200, 48
    frames = []
    for t in range(T):
        ph = t % 12
        tri = 12 * ph if ph < 6 else 12 * (12 - ph)
        frames.append(helpers.render_frame(h, w, (60 + tri, 100), 10, True))
    f = helpers.write_video(frames, str(tmp_path / "jump"), 24)
    kw = dict(fps=24, start_location=IJ(60, 100), target_width=10, window_size=31,
              stream="roi", roi_frames=4, pipeline_depth=2, speculate="predict")

    _, ij_full = track(f, stream="full", fps=24, start_location=IJ(60, 100),
                       target_width=10, window_size=31)

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    dia_fast = str(tmp_path / "a" / "diag.mp4")
    dia_slow = str(tmp_path / "b" / "diag.mp4")

    before = pipeline.replay_count
    _, ij_fast = track(f, diagnostic_file=dia_fast, **kw)
    assert pipeline.replay_count > before  # replays really happened
    assert spy_single[-1] == (True, True)
    np.testing.assert_array_equal(ij_fast, ij_full)

    with views_disabled():
        _, ij_slow = track(f, diagnostic_file=dia_slow, **kw)
    np.testing.assert_array_equal(ij_slow, ij_full)
    np.testing.assert_array_equal(
        _decoded_frames(dia_fast), _decoded_frames(dia_slow)
    )


def test_multi_dia_fast_path(tmp_path):
    """Multi-target fan-out keeps the retained ring with diagnostics on and
    writes the same overlay as the fallback delivery."""
    from pawsometracker_tpu.multi import track_multi

    h, w, T = 160, 240, 40
    frames = []
    for t in range(T):
        img = np.full((h, w), 128, np.uint8)
        cv2.circle(img, (40 + 2 * t, 50), 5, 0, -1)
        cv2.circle(img, (180 - 2 * t, 110), 5, 0, -1)
        frames.append(img)
    f = helpers.write_video(frames, str(tmp_path / "two"), 24)
    kw = dict(fps=24, start_locations=[IJ(50, 40), IJ(110, 180)], target_width=10)

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    dia_fast = str(tmp_path / "a" / "diag.mp4")
    dia_slow = str(tmp_path / "b" / "diag.mp4")

    _, ij_plain = track_multi(f, **kw)
    _, ij_fast = track_multi(f, diagnostic_file=dia_fast, **kw)
    np.testing.assert_array_equal(ij_fast, ij_plain)

    with views_disabled():
        _, ij_slow = track_multi(f, diagnostic_file=dia_slow, **kw)
    np.testing.assert_array_equal(ij_slow, ij_plain)
    np.testing.assert_array_equal(
        _decoded_frames(dia_fast), _decoded_frames(dia_slow)
    )


def test_batch_dia_fast_path(tmp_path):
    """track_batch with per-video diagnostic files keeps the retained ring
    (nat_retained) and matches the fallback overlays byte-for-byte."""
    from pawsometracker_tpu.batch import track_batch

    rng = np.random.default_rng(52)
    _, tra = helpers.build_trajectory(24, 24, (40, 60), rng)
    f = helpers.trajectory2video(tra, str(tmp_path), 24, 160, 120, 10, True)
    kw = dict(fps=24, start_location=IJ(40, 60), target_width=10,
              stream="roi", roi_frames=4, pipeline_depth=2)

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    fast_paths = [str(tmp_path / "a" / "d0.mp4"), str(tmp_path / "a" / "d1.mp4")]
    slow_paths = [str(tmp_path / "b" / "d0.mp4"), str(tmp_path / "b" / "d1.mp4")]

    res_plain = track_batch([f, f], **kw)
    res_fast = track_batch([f, f], diagnostic_files=fast_paths, **kw)
    for (_, ij_p), (_, ij_f) in zip(res_plain, res_fast):
        np.testing.assert_array_equal(ij_f, ij_p)

    with views_disabled():
        res_slow = track_batch([f, f], diagnostic_files=slow_paths, **kw)
    for (_, ij_p), (_, ij_s) in zip(res_plain, res_slow):
        np.testing.assert_array_equal(ij_s, ij_p)
    for pf, ps in zip(fast_paths, slow_paths):
        np.testing.assert_array_equal(_decoded_frames(pf), _decoded_frames(ps))
