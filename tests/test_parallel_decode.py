"""Multi-segment parallel decode: bit-exact parity with the single decoder.

The workers open independent native decoders at mid-stream span starts, so
these tests pin the translation-invariance of the fps-resampler slot math on
real codec content — including H.264 with B-frames (decode order != display
order) and fps resampling (held/duplicated frames at span boundaries).
"""

import math

import numpy as np
import pytest

import helpers
from pawsometracker_tpu.io import native_io
from pawsometracker_tpu.io.parallel_decode import ParallelNativeSource, parallel_ok

pytestmark = pytest.mark.skipif(
    not native_io.native_available(), reason="native pawsio library not built"
)


@pytest.fixture(scope="module")
def h264_clip(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("pdec")
    path = str(d / "clip.mp4")
    w = native_io.NativeVideoWriter(path, 160, 120, 24)
    for t in range(145):  # ~6 s, deliberately NOT a span multiple
        img = np.full((120, 160), 128, np.uint8)
        img[:16, :32] = (t * 5) % 256  # frame counter patch
        ij = (60 + int(30 * np.sin(t / 7)), 80 + int(45 * np.cos(t / 7)))
        cv2.circle(img, (ij[1], ij[0]), 6, 0, -1)
        w.write(img)
    w.release()
    return path


def _all_frames(src, chunk=17):
    out = []
    while True:
        c = src.read_chunk(chunk)
        if c.shape[0] == 0:
            return np.stack(out) if out else np.empty((0,), np.uint8)
        out.extend(np.array(c))
        if c.shape[0] < chunk:
            return np.stack(out)


@pytest.mark.parametrize("workers,span", [(2, 16), (3, 7), (4, 32)])
def test_parity_full_range(h264_clip, workers, span):
    with native_io.NativeFrameSource(h264_clip, fps=24) as ref:
        want = _all_frames(ref)
    with ParallelNativeSource(h264_clip, fps=24, workers=workers, span_frames=span) as par:
        got = _all_frames(par)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("start,stop", [(0.0, 3.0), (1.3, 4.7), (2.0, math.inf)])
def test_parity_sub_window(h264_clip, start, stop):
    kw = dict(start=start, stop=stop, fps=24)
    with native_io.NativeFrameSource(h264_clip, **kw) as ref:
        want = _all_frames(ref)
    with ParallelNativeSource(h264_clip, workers=3, span_frames=10, **kw) as par:
        got = _all_frames(par)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("fps", [12, 18, 24])  # downsample + identity
def test_parity_resampled(h264_clip, fps):
    with native_io.NativeFrameSource(h264_clip, fps=fps) as ref:
        want = _all_frames(ref)
    with ParallelNativeSource(h264_clip, fps=fps, workers=3, span_frames=11) as par:
        got = _all_frames(par)
    np.testing.assert_array_equal(got, want)


def test_upsampling_falls_back_to_single_worker(h264_clip):
    # native 24 fps -> 60 fps output violates the span-start holder guarantee
    par = ParallelNativeSource(h264_clip, fps=60, workers=4, span_frames=16)
    try:
        assert par.workers == 1
        assert not parallel_ok(par.info, 60)
        with native_io.NativeFrameSource(h264_clip, fps=60) as ref:
            want = _all_frames(ref)
        got = _all_frames(par)
        np.testing.assert_array_equal(got, want)
    finally:
        par.close()


def test_parity_ffv1_avi(tmp_path):
    frames = [np.full((64, 96), 128, np.uint8) for _ in range(50)]
    for i, f in enumerate(frames):
        f[:12, :12] = (i * 4) % 256
    path = helpers.write_video(frames, str(tmp_path / "c"), 24, codec="FFV1")
    with native_io.NativeFrameSource(path, fps=24) as ref:
        want = _all_frames(ref)
    with ParallelNativeSource(path, fps=24, workers=2, span_frames=9) as par:
        got = _all_frames(par)
    np.testing.assert_array_equal(got, want)


def test_read_single_and_interleaved_chunks(h264_clip):
    with native_io.NativeFrameSource(h264_clip, fps=24) as ref:
        want = _all_frames(ref, chunk=1)
    with ParallelNativeSource(h264_clip, fps=24, workers=2, span_frames=8) as par:
        got = [par.read()]
        got.extend(np.array(par.read_chunk(5)))
        while True:
            f = par.read()
            if f is None:
                break
            got.append(f)
    np.testing.assert_array_equal(np.stack(got), want)


def test_early_close_joins_workers(h264_clip):
    par = ParallelNativeSource(h264_clip, fps=24, workers=3, span_frames=8)
    par.read_chunk(3)  # consume a little, then abandon
    par.close()
    assert not any(t.is_alive() for t in par._threads)


def test_missing_file_raises():
    with pytest.raises(Exception):
        src = ParallelNativeSource("/nonexistent/x.mp4", fps=24, workers=2)
        try:
            src.read_chunk(4)
        finally:
            src.close()


def test_track_with_decode_workers_matches_default(h264_clip, monkeypatch):
    """End-to-end: the full track() pipeline over the parallel source (env
    opt-in) produces the same positions as the single-decoder default."""
    from pawsometracker_tpu import IJ, track

    want_ts, want_ij = track(h264_clip, start_location=IJ(60, 80), target_width=12)
    monkeypatch.setenv("PAWSIO_DECODE_WORKERS", "3")
    got_ts, got_ij = track(h264_clip, start_location=IJ(60, 80), target_width=12)
    np.testing.assert_array_equal(np.asarray(got_ij), np.asarray(want_ij))
    np.testing.assert_allclose(got_ts, want_ts)


def test_retained_roi_protocol_parity(h264_clip):
    """read_roi_chunk_retained / recrop / release on the parallel source must
    match the native C++ ring's crops frame for frame."""
    ref = native_io.NativeFrameSource(h264_clip, fps=24, prefetch=32)
    par = ParallelNativeSource(h264_clip, fps=24, workers=3, span_frames=10)
    try:
        origin, ch, cw = (40, 60), 48, 56
        a = ref.read_roi_chunk_retained(8, origin, ch, cw, 128)
        b = par.read_roi_chunk_retained(8, origin, ch, cw, 128)
        np.testing.assert_array_equal(a, b)
        # replay-style recrop at a corrected origin over the retained window
        a2 = ref.recrop(2, 5, (30, 50), ch, cw, 128)
        b2 = par.recrop(2, 5, (30, 50), ch, cw, 128)
        np.testing.assert_array_equal(a2, b2)
        ref.release(8)
        par.release(8)
        # next retained chunk continues the stream (crosses a span boundary)
        a3 = ref.read_roi_chunk_retained(8, (50, 70), ch, cw, 128)
        b3 = par.read_roi_chunk_retained(8, (50, 70), ch, cw, 128)
        np.testing.assert_array_equal(a3, b3)
    finally:
        ref.close()
        par.close()


def test_retained_interleave_guard(h264_clip):
    par = ParallelNativeSource(h264_clip, fps=24, workers=2, span_frames=8)
    try:
        par.read_roi_chunk_retained(4, (10, 10), 32, 32, 128)
        with pytest.raises(IOError):
            par.read_chunk(2)
        with pytest.raises(IOError):
            par.read_roi_chunk(2, (10, 10), 32, 32, 128)
        par.release(4)
        assert par.read_chunk(2).shape[0] == 2  # clean again
    finally:
        par.close()


def test_contain_roi_chunk_matches_native(h264_clip):
    with native_io.NativeFrameSource(h264_clip, fps=24, prefetch=16) as ref:
        a = ref.read_roi_chunk(12, (-5, 100), 40, 80, 99)
    with ParallelNativeSource(h264_clip, fps=24, workers=2, span_frames=7) as par:
        b = par.read_roi_chunk(12, (-5, 100), 40, 80, 99)
    np.testing.assert_array_equal(a, b)


def test_track_multi_with_decode_workers(h264_clip, monkeypatch):
    """track_multi over the parallel source's retained protocol (advance +
    per-target recrop) equals the default path."""
    from pawsometracker_tpu import IJ
    from pawsometracker_tpu.multi import track_multi

    locs = [IJ(60, 80)]
    want_ts, want = track_multi(h264_clip, locs, target_width=12)
    monkeypatch.setenv("PAWSIO_DECODE_WORKERS", "3")
    got_ts, got = track_multi(h264_clip, locs, target_width=12)
    np.testing.assert_array_equal(got, want)


def test_mispredict_replay_over_parallel_source(tmp_path, monkeypatch):
    """The mispredict replay recrops from the parallel source's Python
    retention (the recrop path) and must still be full-path identical."""
    import cv2

    from pawsometracker_tpu import IJ, pipeline, track

    h, w, T = 200, 200, 48
    frames = []
    for t in range(T):
        ph = t % 12
        tri = 12 * ph if ph < 6 else 12 * (12 - ph)
        img = np.full((h, w), 128, np.uint8)
        cv2.circle(img, (100, 60 + tri), 5, 0, -1)
        frames.append(img)
    f = helpers.write_video(frames, str(tmp_path / "jump"), 24)
    kw = dict(fps=24, start_location=IJ(60, 100), target_width=10, window_size=31)
    _, want = track(f, stream="full", **kw)
    monkeypatch.setenv("PAWSIO_DECODE_WORKERS", "3")
    before = pipeline.replay_count
    _, got = track(f, stream="roi", roi_frames=4, pipeline_depth=2, **kw)
    np.testing.assert_array_equal(got, want)
    assert pipeline.replay_count > before


def test_vfr_gap_divergence_detected_and_fixed(tmp_path):
    """A VFR clip with an inter-frame gap wider than one average interval at a
    span boundary: the worker's entry loses the held frame, the consumer's
    boundary verification catches the byte mismatch, and the source falls
    back to an exact sequential decode — output equals workers=1."""
    path = str(tmp_path / "vfr.mp4")
    w = native_io.NativeVFRWriter(path, 96, 64)
    t = 0.0
    k = 0
    while t < 4.0:
        img = np.full((64, 96), 128, np.uint8)
        img[:16, :16] = (k * 7) % 256
        w.write(img, t)
        k += 1
        # a 1.2 s dead gap after t=1.0 (camera stalled)
        t += 1.2 if abs(t - 1.0) < 1e-9 else 1 / 24
    w.release()

    with native_io.NativeFrameSource(path, fps=24) as ref:
        want = _all_frames(ref)
    par = ParallelNativeSource(path, fps=24, workers=3, span_frames=10)
    try:
        got = _all_frames(par)
        fell_back = par._seq is not None
    finally:
        par.close()
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
    # the clip must have actually exercised the divergence path (if the CFR
    # pre-guard already rejected it, the test is vacuous)
    if par.workers > 1:
        assert fell_back, "expected the boundary verification to trip on the gap"


@pytest.fixture(scope="module")
def long_gop_clip(tmp_path_factory):
    """600 frames, native x264 (GOP 12): dozens of keyframes for the span
    planner, with keyframe spacing larger than small test spans (exercising
    both the aligned boundaries and the giant-GOP split path)."""
    d = tmp_path_factory.mktemp("plan")
    path = str(d / "long.mp4")
    w = native_io.NativeVideoWriter(path, 96, 64, 24)
    for t in range(600):
        img = np.full((64, 96), 128, np.uint8)
        img[:16, :16] = (t * 3) % 256
        img[40:48, (t * 2) % 88 : (t * 2) % 88 + 8] = 30
        w.write(img)
    w.release()
    return path


@pytest.mark.parametrize("span", [8, 10, 24, 64])
def test_keyframe_aligned_parity(long_gop_clip, span):
    with native_io.NativeFrameSource(long_gop_clip, fps=24) as ref:
        want = _all_frames(ref)
    par = ParallelNativeSource(long_gop_clip, fps=24, workers=3, span_frames=span)
    try:
        assert len(par._starts) > 1  # the keyframe plan actually engaged
        got = _all_frames(par)
        assert par._seq is None  # no boundary-verification fallback happened
    finally:
        par.close()
    np.testing.assert_array_equal(got, want)


def test_keyframe_plan_boundaries_land_after_keyframes(long_gop_clip):
    par = ParallelNativeSource(long_gop_clip, fps=24, workers=2, span_frames=24)
    try:
        aligned = [(a, h) for a, h in zip(par._starts, par._hints) if h >= 0]
        assert aligned, "no aligned boundaries in the plan"
        # each boundary sits a small decode-delay margin past ITS keyframe
        # (hint = the keyframe time the worker seeks to); margin is
        # 0.5/fps + 4.5/native -> at most ~6 slots here
        for a, h in aligned:
            slot_kf = int(np.floor(h * 24 + 0.5 + 1e-9))
            assert slot_kf + 1 <= a <= slot_kf + 8, (a, h)
    finally:
        par.close()


def test_keyframe_align_off_still_exact(long_gop_clip):
    with native_io.NativeFrameSource(long_gop_clip, fps=24) as ref:
        want = _all_frames(ref)
    with ParallelNativeSource(long_gop_clip, fps=24, workers=3, span_frames=16,
                              keyframe_align=False) as par:
        got = _all_frames(par)
    np.testing.assert_array_equal(got, want)


def test_keyframe_aligned_sub_window_and_resample(long_gop_clip):
    kw = dict(start=3.3, stop=14.8, fps=18)
    with native_io.NativeFrameSource(long_gop_clip, **kw) as ref:
        want = _all_frames(ref)
    with ParallelNativeSource(long_gop_clip, workers=3, span_frames=16, **kw) as par:
        got = _all_frames(par)
    np.testing.assert_array_equal(got, want)


def test_static_scene_stall_caught_by_pts_chain(tmp_path):
    """A VFR stall during a STATIC scene: the misaligned worker's boundary
    frame is byte-identical to the held frame, so pixel comparison alone
    would pass and a slot-shifted span would be served. The holder-PTS chain
    catches it; output must equal the sequential decode."""
    path = str(tmp_path / "static_stall.mp4")
    w = native_io.NativeVFRWriter(path, 96, 64)
    t, k = 0.0, 0
    while t < 4.0:
        img = np.full((64, 96), 128, np.uint8)
        if t < 0.8 or t > 2.4:  # motion only away from the stall window
            img[:16, :16] = (k * 7) % 256
        w.write(img, t)
        k += 1
        t += 1.2 if abs(t - 1.0) < 1e-9 else 1 / 24
    w.release()

    with native_io.NativeFrameSource(path, fps=24) as ref:
        want = _all_frames(ref)
    par = ParallelNativeSource(path, fps=24, workers=3, span_frames=10,
                               keyframe_align=False)
    try:
        got = _all_frames(par)
    finally:
        par.close()
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_half_slot_keyframes_48_to_24(tmp_path):
    """48 fps content decoded at 24: keyframes land exactly on half-slots, so
    banker's rounding in the planner would misplace EVERY boundary by one
    slot and permanently trip the fallback (regression: the planner must
    round ties away from zero like the C++ resampler's AV_ROUND_NEAR_INF)."""
    path = str(tmp_path / "fps48.mp4")
    w = native_io.NativeVideoWriter(path, 96, 64, 48)
    for t in range(480):  # 10 s at 48 fps, GOP 12 -> keyframes every 0.25 s
        img = np.full((64, 96), 128, np.uint8)
        img[:16, :16] = (t * 3) % 256
        w.write(img)
    w.release()
    with native_io.NativeFrameSource(path, fps=24) as ref:
        want = _all_frames(ref)
    par = ParallelNativeSource(path, fps=24, workers=3, span_frames=16)
    try:
        assert len(par._starts) > 1
        got = _all_frames(par)
        fell_back = par._seq is not None
    finally:
        par.close()
    np.testing.assert_array_equal(got, want)
    assert not fell_back, "boundary verification tripped on aligned spans"


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_property_random_vfr_streams(tmp_path, seed):
    """Property: for ARBITRARY pts streams (random jitter, stalls, bursts),
    the parallel source equals the sequential decode bit-for-bit — via
    aligned spans when safe, via verified fallback otherwise."""
    rng = np.random.default_rng(100 + seed)
    path = str(tmp_path / f"prop{seed}.mp4")
    w = native_io.NativeVFRWriter(path, 96, 64)
    t = 0.0
    k = 0
    while t < 5.0 and k < 200:
        img = np.full((64, 96), 128, np.uint8)
        img[:16, :16] = (k * 11) % 256
        if rng.random() < 0.7:  # sometimes static frames around gaps
            img[40:56, 40:56] = (k * 5) % 256
        w.write(img, t)
        k += 1
        r = rng.random()
        if r < 0.05:
            t += rng.uniform(0.3, 1.0)  # stall
        elif r < 0.2:
            t += rng.uniform(0.001, 0.01)  # burst
        else:
            t += rng.uniform(0.02, 0.08)  # jittery ~12-50 fps
    w.release()

    fps = float(rng.choice([12, 24, 30]))
    with native_io.NativeFrameSource(path, fps=fps) as ref:
        want = _all_frames(ref)
    span = int(rng.integers(5, 20))
    workers = int(rng.integers(2, 5))
    with ParallelNativeSource(path, fps=fps, workers=workers, span_frames=span) as par:
        got = _all_frames(par)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_array_equal(got, want)


def test_decode_workers_kwarg(h264_clip):
    """decode_workers as a first-class kwarg (no env var) on track/batch/multi."""
    from pawsometracker_tpu import IJ, track
    from pawsometracker_tpu.batch import track_batch
    from pawsometracker_tpu.multi import track_multi

    kw = dict(start_location=IJ(60, 80), target_width=12)
    _, want = track(h264_clip, **kw)
    _, got = track(h264_clip, decode_workers=3, **kw)
    np.testing.assert_array_equal(got, want)
    res = track_batch([h264_clip], decode_workers=2, **kw)
    np.testing.assert_array_equal(res[0][1], want)
    _, multi = track_multi(h264_clip, [IJ(60, 80)], target_width=12, decode_workers=2)
    np.testing.assert_array_equal(multi[:, 0], want)


def test_leading_gap_skipped_slots_fall_back(tmp_path):
    """A leading VFR gap past `start` makes the decoder SKIP output slots
    (delivery index != slot number) — the first-slot probe must detect it and
    stay sequential (regression: spans stitched duplicated frames with both
    boundary checks passing, because the skipped-start worker shows the same
    held frame)."""
    path = str(tmp_path / "gap.mp4")
    w = native_io.NativeVFRWriter(path, 64, 48)
    for k, t in enumerate([0.0, 0.02, 0.05, 0.1, 0.15, 1.5, 1.51, 2.7, 2.72]):
        img = np.full((48, 64), 128, np.uint8)
        img[:12, :12] = (k * 13) % 256
        w.write(img, t)
    w.release()
    for start in (0.25, 0.5):
        with native_io.NativeFrameSource(path, start=start, fps=10) as ref:
            want = _all_frames(ref)
        for span in (5, 9):
            with ParallelNativeSource(path, start=start, fps=10, workers=3,
                                      span_frames=span, keyframe_align=False) as par:
                got = _all_frames(par)
            assert got.shape == want.shape, (start, span, got.shape, want.shape)
            np.testing.assert_array_equal(got, want)


def test_fractional_stop_count_matches_decoder(tmp_path):
    """stop*fps fractional: the C++ emit rule yields ceil(fps*d) outputs; the
    parallel slot limit must not undercount by one (regression)."""
    import cv2

    path = str(tmp_path / "frac.mp4")
    w = native_io.NativeVideoWriter(path, 64, 48, 24)
    for t in range(80):
        img = np.full((48, 64), 128, np.uint8)
        img[:12, :12] = (t * 3) % 256
        w.write(img)
    w.release()
    for stop in (1.605, 2.04, 29 / 24):
        with native_io.NativeFrameSource(path, stop=stop, fps=12) as ref:
            want = _all_frames(ref)
        with ParallelNativeSource(path, stop=stop, fps=12, workers=3, span_frames=7) as par:
            got = _all_frames(par)
        assert got.shape == want.shape, (stop, got.shape, want.shape)
        np.testing.assert_array_equal(got, want)


def test_empty_span_cannot_declare_unverified_eof(tmp_path):
    """A worker whose entry missed the held frame can produce an EMPTY span
    (first kept input claims a slot at/after the stream end) — a bogus early
    EOF. EOF authority requires the span's boundary to VERIFY first
    (regression: fuzz seed 90020 lost a frame to an unverified empty span)."""
    path = str(tmp_path / "tail.mp4")
    w = native_io.NativeVFRWriter(path, 64, 48)
    # input 0 before start; input 1 just after; input 2 held for a long run;
    # final input claims the last slot — a mid-stream span entry discards the
    # held input 2 and sees only the final input (or nothing)
    for k, t in enumerate([1.38, 1.52, 1.55, 2.95]):
        img = np.full((48, 64), 128, np.uint8)
        img[:12, :12] = (k * 13) % 256
        w.write(img, t)
    w.release()
    kw = dict(start=1.4344552919193405, stop=2.960500602196178, fps=10)
    with native_io.NativeFrameSource(path, **kw) as ref:
        want = _all_frames(ref)
    for span in (5, 8, 13):
        with ParallelNativeSource(path, workers=3, span_frames=span,
                                  keyframe_align=False, **kw) as par:
            got = _all_frames(par)
        assert got.shape == want.shape, (span, got.shape, want.shape)
        np.testing.assert_array_equal(got, want)


def test_plan_spans_no_trailing_sliver(monkeypatch):
    """A GOP slightly longer than span_frames must not leave a sliver span
    (< min_span) that pays a full decoder open for a handful of frames —
    the last synthetic boundary moves onto the keyframe instead (review
    finding on _plan_spans)."""
    from types import SimpleNamespace

    from pawsometracker_tpu.io import native_io as nio
    from pawsometracker_tpu.io import parallel_decode as pd

    src = ParallelNativeSource.__new__(ParallelNativeSource)
    src.path = "fake.mp4"
    src.start = 0.0
    src.fps = 24.0
    src.info = SimpleNamespace(fps=24.0)
    src._span_frames = 64
    src._slot_limit = None
    src._starts = [0]
    src._hints = [-1.0]
    # keyframe at t=64/24 lands boundary a=70 (margin ~6 slots): 6 past the
    # 64-frame split — the sliver case
    monkeypatch.setattr(nio, "native_keyframes",
                        lambda p: np.array([0.0, 64.0 / 24.0]))
    src._plan_spans()
    assert src._starts == [0, 70], src._starts
    assert src._hints[1] == pytest.approx(64.0 / 24.0)  # kept the seek hint

    # a comfortably-large remainder still splits into synthetic + keyframe
    src2 = ParallelNativeSource.__new__(ParallelNativeSource)
    src2.path = "fake.mp4"
    src2.start = 0.0
    src2.fps = 24.0
    src2.info = SimpleNamespace(fps=24.0)
    src2._span_frames = 64
    src2._slot_limit = None
    src2._starts = [0]
    src2._hints = [-1.0]
    monkeypatch.setattr(nio, "native_keyframes",
                        lambda p: np.array([0.0, 100.0 / 24.0]))
    src2._plan_spans()
    assert src2._starts == [0, 64, 106], src2._starts


# -- mocked-decoder concurrency (round-4 VERDICT #8) -------------------------
#
# The raw libav W-x scaling can only be measured on a multi-core host (the
# bench `pdecode` stage stays armed for that); what IS testable anywhere is
# the scheduling math itself: with a mocked slow decoder whose per-frame cost
# is sleep (GIL-free, so spans overlap even on one core), the span scheduler
# must deliver W-way overlap, respect the workers+2 open-span budget, and
# still produce the exact in-order frame stream.


class _MockClock:
    """Shared recording state for one mocked run."""

    def __init__(self):
        import threading

        self.lock = threading.Lock()
        self.open_now = 0
        self.max_open = 0
        self.windows = []  # (t_open, t_close, slot0) per decoder


def _mock_decoder_cls(clock, T, delay, h=16, w=24):
    import time as _time

    def frame_of(slot):
        f = np.empty((h, w), np.uint8)
        f[:] = (slot * 7 + 3) % 256
        return f

    class MockDecoder:
        def __init__(self, path, *, start=0.0, stop=math.inf, fps=24.0,
                     prefetch=0, threads=-1, slot0=0, seek_hint=-1.0, fast=None):
            self.slot0 = int(slot0)
            self.pos = int(slot0)
            self._t_open = _time.perf_counter()
            with clock.lock:
                clock.open_now += 1
                clock.max_open = max(clock.max_open, clock.open_now)

        def read_chunk(self, n, out=None):
            k = max(0, min(int(n), T - self.pos))
            _time.sleep(delay * k)  # "decode" cost: GIL-free wait
            chunk = np.stack([frame_of(self.pos + i) for i in range(k)]) if k \
                else np.empty((0, h, w), np.uint8)
            self.pos += k
            return chunk

        @property
        def last_pts(self):
            return self.pos - 1  # holder pts == slot: 1:1 CFR stream

        @property
        def last_slot(self):
            return self.pos - 1

        def close(self):
            with clock.lock:
                clock.open_now -= 1
                clock.windows.append(
                    (self._t_open, __import__("time").perf_counter(), self.slot0)
                )

    return MockDecoder


def _mocked_source(monkeypatch, clock, *, T, delay, workers, span_frames):
    import types

    from pawsometracker_tpu.io import parallel_decode
    from pawsometracker_tpu.io.decode import VideoInfo

    mock_cls = _mock_decoder_cls(clock, T, delay)
    info = VideoInfo(width=24, height=16, fps=24.0, sar=1.0, frame_count=T)
    monkeypatch.setattr(native_io, "NativeFrameSource", mock_cls)
    monkeypatch.setattr(native_io, "native_probe", lambda p: info)
    monkeypatch.setattr(
        native_io, "_load",
        lambda: types.SimpleNamespace(pawsio_open_span=True, pawsio_last_slot=True),
    )
    return parallel_decode.ParallelNativeSource(
        "mock.mp4", fps=24.0, stop=T / 24.0, workers=workers,
        span_frames=span_frames, keyframe_align=False,
    )


def test_mocked_scheduler_w_way_overlap(monkeypatch):
    """W=4 workers over a slow mocked decoder: the stream is exact and in
    order, the wall clock beats the serial decode by a wide margin (the
    overlap is real), at least min(W, spans) decoders ran concurrently, and
    the open-span budget (workers + 2) was never exceeded."""
    import time

    T, delay, W, S = 96, 0.004, 4, 16
    clock = _MockClock()
    src = _mocked_source(monkeypatch, clock, T=T, delay=delay, workers=W, span_frames=S)
    try:
        t0 = time.perf_counter()
        frames = []
        while True:
            c = src.read_chunk(13)
            if c.shape[0] == 0:
                break
            frames.append(c.copy())
        wall = time.perf_counter() - t0
    finally:
        src.close()
    got = np.concatenate(frames)
    assert got.shape[0] == T
    want = np.stack([np.full((16, 24), (s * 7 + 3) % 256, np.uint8) for s in range(T)])
    np.testing.assert_array_equal(got, want)  # exact, in order

    serial = T * delay
    assert wall < 0.62 * serial, f"no W-way overlap: wall {wall:.3f}s vs serial {serial:.3f}s"
    assert clock.max_open >= min(W, T // S) - 1  # decoders genuinely concurrent
    assert clock.max_open <= W + 2  # flow-control budget respected

    # every span decoded its own slot range (lead frame = one slot early)
    slot0s = sorted(w[2] for w in clock.windows)
    assert slot0s[0] == 0 and len(slot0s) == T // S


def test_mocked_scheduler_budget_blocks_runahead(monkeypatch):
    """With a consumer that pauses mid-stream, workers may run at most
    workers+2 spans ahead (open or buffered) — the budget semaphore holds
    even while the consumer is idle."""
    import time

    T, delay, W, S = 160, 0.001, 2, 16
    clock = _MockClock()
    src = _mocked_source(monkeypatch, clock, T=T, delay=delay, workers=W, span_frames=S)
    try:
        assert src.read_chunk(4).shape[0] == 4  # start the stream
        time.sleep(0.25)  # give workers time to run ahead as far as allowed
        with src._lock:
            claimed = src._next_ticket
        # budget: W+2 spans open/buffered beyond the one being consumed
        assert claimed <= 1 + (W + 2) + 1
        rest = []
        while True:
            c = src.read_chunk(32)
            if c.shape[0] == 0:
                break
            rest.append(c.copy())
        assert 4 + sum(c.shape[0] for c in rest) == T
    finally:
        src.close()
