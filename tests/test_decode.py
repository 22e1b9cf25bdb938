"""Host decode layer tests: fps resampling semantics, seek windows, prefetch.

The resampler reproduces ffmpeg's ``fps`` filter (round=near) used by the
reference's decode pipe (reference: src/PawsomeTracker.jl:155).
"""

import numpy as np
import pytest

from pawsometracker_tpu.io.decode import (
    ChunkPrefetcher,
    OpenCVFrameSource,
    fps_slot,
    open_source,
    probe,
)

import helpers


@pytest.fixture(scope="module")
def counter_video(tmp_path_factory):
    """24fps video whose frame index is encoded in a solid 16x16 patch value."""
    d = tmp_path_factory.mktemp("vid")
    frames = []
    for i in range(48):  # 2 seconds
        f = np.full((64, 64), 128, np.uint8)
        f[:16, :16] = i * 5  # recover index as round(patch/5)
        frames.append(f)
    return helpers.write_video(frames, str(d / "counter"), 24, codec="FFV1"), 24


def read_indices(src):
    out = []
    while True:
        f = src.read()
        if f is None:
            return out
        out.append(int(np.round(float(np.median(f[:16, :16])) / 5)))


def test_fps_slot_round_near():
    assert fps_slot(0.0, 24) == 0
    assert fps_slot(1.0, 24) == 24
    # round half away from zero
    assert fps_slot(1.5 / 24, 24) == 2
    assert fps_slot(0.49 / 24, 24) == 0


def test_probe(counter_video):
    path, fps = counter_video
    info = probe(path)
    assert info.width == 64 and info.height == 64
    assert info.fps == pytest.approx(fps)
    assert info.sar == 1.0


def test_identity_resample(counter_video):
    path, fps = counter_video
    with OpenCVFrameSource(path, fps=fps) as src:
        idx = read_indices(src)
    assert idx == list(range(48))


def test_downsample_half(counter_video):
    path, fps = counter_video
    with OpenCVFrameSource(path, fps=fps / 2) as src:
        idx = read_indices(src)
    # 12 fps over 2 s -> 24 frames (+1 for the EOF flush of the final slot)
    assert len(idx) in (24, 25)
    assert idx[0] == 0
    deltas = np.diff(idx)
    assert set(deltas) <= {1, 2, 3}
    assert np.mean(deltas) == pytest.approx(2.0, abs=0.2)


def test_upsample_double(counter_video):
    path, fps = counter_video
    with OpenCVFrameSource(path, fps=fps * 2) as src:
        idx = read_indices(src)
    # 48 fps over 2 s -> ~96 frames with duplicates
    assert 94 <= len(idx) <= 97
    deltas = np.diff(idx)
    assert set(deltas) <= {0, 1}
    assert np.mean(deltas) == pytest.approx(0.5, abs=0.1)


def test_start_stop_clamp(counter_video):
    path, fps = counter_video
    with OpenCVFrameSource(path, start=1.0, stop=1.5, fps=fps) as src:
        idx = read_indices(src)
    # frames in [1.0, 1.5) at 24fps -> 12 frames starting at index 24
    assert len(idx) == 12
    assert idx[0] in (23, 24, 25)


def test_read_chunk_and_eof(counter_video):
    path, fps = counter_video
    with OpenCVFrameSource(path, fps=fps) as src:
        c1 = src.read_chunk(30)
        c2 = src.read_chunk(30)
        c3 = src.read_chunk(30)
    assert c1.shape == (30, 64, 64)
    assert c2.shape == (18, 64, 64)
    assert c3.shape == (0, 64, 64)


def test_chunk_prefetcher(counter_video):
    path, fps = counter_video
    src = OpenCVFrameSource(path, fps=fps)
    chunks = list(ChunkPrefetcher(src, chunk_size=20, max_frames=45))
    src.close()
    ks = [c.shape[0] for c in chunks]
    assert ks == [20, 20, 5]


def test_chunk_prefetcher_close_joins_thread(counter_video):
    """close() must stop AND join the producer before the source is destroyed
    (otherwise the thread can race a native decoder teardown)."""
    path, fps = counter_video
    src = OpenCVFrameSource(path, fps=fps)
    pf = ChunkPrefetcher(src, chunk_size=4, max_frames=45)
    it = iter(pf)
    next(it)  # consume one chunk, leave the producer mid-stream
    pf.close()
    assert not pf._thread.is_alive()
    src.close()


def test_open_source_auto(counter_video):
    path, fps = counter_video
    src = open_source(path, fps=fps)
    try:
        assert src.read().shape == (64, 64)
    finally:
        src.close()


# -- variable frame rate: PTS-true decode on BOTH backends -------------------


@pytest.fixture(scope="module")
def vfr_video(tmp_path_factory):
    """VFR clip (needs the native encoder): a blob moving as a function of
    TIME, 24fps for 2 s then 12fps for 2 s. A constant-frame-rate assumption
    mis-times the second half by 2x."""
    from pawsometracker_tpu.io.native_io import native_available

    if not native_available():
        pytest.skip("native encoder unavailable")
    import cv2

    from pawsometracker_tpu.io.native_io import NativeVFRWriter

    d = tmp_path_factory.mktemp("vfr")
    path = str(d / "vfr.mp4")
    times = [k / 24 for k in range(48)] + [2.0 + k / 12 for k in range(24)]
    w = NativeVFRWriter(path, 100, 100)
    for t in times:
        ij = (int(20 + 15 * t), int(20 + 15 * t))
        f = np.full((100, 100), 128, np.uint8)
        cv2.circle(f, (ij[1], ij[0]), 5, 0, -1)
        w.write(f, t)
    w.release()
    return path


def _blob_positions(src):
    """Centroid of the dark blob per emitted frame."""
    out = []
    while True:
        fr = src.read()
        if fr is None:
            break
        ii, jj = np.nonzero(fr < 64)
        out.append((ii.mean(), jj.mean()))
    return np.asarray(out)


def test_vfr_opencv_fallback_is_pts_true(vfr_video):
    """The cv2 fallback must resample VFR content by real container pts, not
    the frame counter: emitted positions track TIME. (decode.py pts mode)"""
    with OpenCVFrameSource(vfr_video, fps=24) as src:
        pos = _blob_positions(src)
        assert src._pts_mode  # the VFR jump flipped it
    # time-keyed ground truth: emitted slot s shows the blob at ~20 + 15*s/24
    expect = 20 + 15 * np.arange(len(pos)) / 24
    rmse = np.sqrt(np.mean((pos[:, 0] - expect) ** 2))
    assert len(pos) >= 90  # ~4 s at 24 fps (dup-filled 12 fps section)
    assert rmse < 1.5, rmse


def test_vfr_opencv_fallback_warns_once(vfr_video, caplog):
    """Selecting the best-effort cv2 backend for VFR content must WARN the
    user and name the native backend (the guarantee matrix is enforced, not
    just documented)."""
    import logging

    with caplog.at_level(logging.WARNING, logger="pawsometracker_tpu.io.decode"):
        with OpenCVFrameSource(vfr_video, fps=24) as src:
            while src.read() is not None:
                pass
            assert src._pts_mode
    warnings = [r for r in caplog.records if "best-effort on VFR" in r.getMessage()]
    assert len(warnings) == 1, f"expected exactly one VFR warning, got {len(warnings)}"
    assert "native" in warnings[0].getMessage()


def test_vfr_backends_agree(vfr_video):
    """Native (authoritative pts) and cv2 fallback must produce the same
    resampling structure; content may differ on a frame or two where cv2's
    demux mangles irregular timestamps."""
    from pawsometracker_tpu.io.native_io import NativeFrameSource

    pn = _blob_positions(NativeFrameSource(vfr_video, fps=24))
    po = _blob_positions(OpenCVFrameSource(vfr_video, fps=24))
    assert len(pn) == len(po)
    diff = np.abs(pn - po).max(axis=1)
    assert (diff > 2).sum() == 0
    assert (diff > 0).mean() < 0.05  # <5% of frames may differ (by <=2 px)


def test_cfr_still_uses_exact_counter(counter_video):
    """CFR content must keep the exact-rational counter timeline (no pts-mode
    switch): bit-exact fps-filter parity depends on it."""
    path, fps = counter_video
    with OpenCVFrameSource(path, fps=fps) as src:
        while src.read() is not None:
            pass
        assert not src._pts_mode


def test_track_opencv_backend_matches_native(tmp_path):
    """End-to-end track() parity between the decode backends (the OpenCV
    fallback must produce the same positions as the C++ layer)."""
    import cv2

    from pawsometracker_tpu import IJ, track
    from pawsometracker_tpu.io.native_io import native_available

    if not native_available():
        pytest.skip("native layer not built")
    path = str(tmp_path / "b.avi")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"FFV1"), 24, (200, 150), isColor=False)
    for t in range(60):
        f = np.full((150, 200), 128, np.uint8)
        cv2.circle(f, (40 + 2 * t, 75 + int(20 * np.sin(t / 6))), 6, 0, -1)
        vw.write(f)
    vw.release()
    kw = dict(start_location=IJ(75, 40), target_width=12, fps=24)
    _, a = track(path, backend="native", **kw)
    _, b = track(path, backend="opencv", **kw)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
