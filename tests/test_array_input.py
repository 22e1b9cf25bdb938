"""In-memory frame-array input: ``track``/``track_multi``/``track_batch`` on
``[T, H, W]`` (gray) / ``[T, H, W, 3]`` (RGB) uint8 ndarrays.

The contract under test: tracking an array is BIT-EQUAL to tracking the same
frames read back from a losslessly encoded (FFV1) file — the array source
(`io.decode.ArrayFrameSource`) shares the exact fps-filter resampler with the
file backends, so positions, timestamps, and truncation semantics all match.
This input kind has no reference counterpart (the reference takes file paths
only, src/PawsomeTracker.jl:130-146); the tracking semantics it must preserve
are the reference's.
"""

import numpy as np
import pytest

from pawsometracker_tpu import IJ, track, track_batch, track_multi
from pawsometracker_tpu.io.decode import ArrayFrameSource, open_source

import helpers


def _spiral_frames(h=100, w=100, fps=24, seconds=3.0, start_ij=(50, 50), tw=10,
                   darker=True, seed=0):
    rng = np.random.default_rng(seed)
    r = 0.8 * min(start_ij[0], start_ij[1], h - 1 - start_ij[0], w - 1 - start_ij[1])
    _, tra = helpers.build_trajectory(r, fps, start_ij, rng, seconds=seconds)
    frames = np.stack([helpers.render_frame(h, w, ij, tw, darker) for ij in tra])
    return frames, np.asarray(tra, float)


def test_track_array_matches_file(tmp_path):
    frames, truth = _spiral_frames()
    path = helpers.write_video(list(frames), str(tmp_path / "clip"), 24)
    kw = dict(start_location=IJ(50, 50), target_width=10)
    ts_a, ij_a = track(frames, **kw)
    ts_f, ij_f = track(path, **kw)
    np.testing.assert_array_equal(ij_a, ij_f)
    np.testing.assert_allclose(ts_a, ts_f)
    rmse = float(np.sqrt(np.mean(np.sum((ij_a - truth[: len(ij_a)]) ** 2, axis=1))))
    assert rmse < 1.0


def test_track_array_autodetect_rmse(tmp_path):
    frames, truth = _spiral_frames()
    ts, ij = track(frames, target_width=10)  # start_location=None: auto-detect
    rmse = float(np.sqrt(np.mean(np.sum((ij - truth[: len(ij)]) ** 2, axis=1))))
    assert rmse < 1.0


def test_input_fps_resampling_matches_file(tmp_path):
    # frames at a 48 fps native rate, tracked on the 24 fps output grid: the
    # array source must select the same frames as the file backends' fps filter
    frames, _ = _spiral_frames(fps=48, seconds=2.0)
    path = helpers.write_video(list(frames), str(tmp_path / "clip48"), 48)
    kw = dict(start_location=IJ(50, 50), target_width=10, fps=24)
    ts_a, ij_a = track(frames, input_fps=48, **kw)
    ts_f, ij_f = track(path, **kw)
    assert len(ij_a) == len(ij_f)
    np.testing.assert_array_equal(ij_a, ij_f)


def test_rgb_array_matches_gray():
    frames, _ = _spiral_frames(seconds=1.5)
    rgb = np.repeat(frames[..., None], 3, axis=-1)
    kw = dict(start_location=IJ(50, 50), target_width=10)
    _, ij_g = track(frames, **kw)
    _, ij_c = track(rgb, **kw)
    # equal channels -> BT.601 luma is the gray value exactly
    np.testing.assert_array_equal(ij_g, ij_c)


def test_start_stop_subrange_matches_file(tmp_path):
    frames, _ = _spiral_frames()
    path = helpers.write_video(list(frames), str(tmp_path / "clip"), 24)
    kw = dict(start_location=IJ(50, 50), target_width=10, start=1.0, stop=2.5)
    ts_a, ij_a = track(frames, **kw)
    ts_f, ij_f = track(path, **kw)
    np.testing.assert_array_equal(ij_a, ij_f)
    np.testing.assert_allclose(ts_a, ts_f)


def test_segment_list_of_arrays_matches_files(tmp_path):
    frames, _ = _spiral_frames()
    segs = helpers.partition(list(frames), 2)
    paths = [
        helpers.write_video(s, str(tmp_path / f"seg{k}"), 24)
        for k, s in enumerate(segs)
    ]
    kw = dict(start_location=IJ(50, 50), target_width=10)
    ts_a, ij_a = track([np.stack(s) for s in segs], **kw)
    ts_f, ij_f = track(paths, **kw)
    np.testing.assert_array_equal(ij_a, ij_f)
    np.testing.assert_allclose(ts_a, ts_f)


def test_track_multi_array_matches_file(tmp_path):
    # two independent blobs wobbling in place
    h, w, tw = 100, 100, 9
    rng = np.random.default_rng(3)
    centers = [(30, 30), (70, 72)]
    frames = []
    for t in range(48):
        img = np.full((h, w), 128, np.uint8)
        for ci, cj in centers:
            jit = rng.normal(0, 1.0, 2)
            import cv2

            cv2.circle(img, (int(cj + jit[1]), int(ci + jit[0])), tw // 2, 0, -1)
        frames.append(img)
    frames = np.stack(frames)
    path = helpers.write_video(list(frames), str(tmp_path / "two"), 24)
    locs = [IJ(30, 30), IJ(70, 72)]
    ts_a, ij_a = track_multi(frames, locs, target_width=tw)
    ts_f, ij_f = track_multi(path, locs, target_width=tw)
    np.testing.assert_array_equal(ij_a, ij_f)


def test_track_batch_mixed_paths_and_arrays(tmp_path):
    frames, _ = _spiral_frames(seconds=1.5)
    path = helpers.write_video(list(frames), str(tmp_path / "clip"), 24)
    kw = dict(start_location=IJ(50, 50), target_width=10)
    out = track_batch([path, frames], **kw)
    ts_one, ij_one = track(frames, **kw)
    for ts_i, ij_i in out:
        np.testing.assert_array_equal(ij_i, ij_one)
        np.testing.assert_allclose(ts_i, ts_one)


def test_array_source_validation():
    with pytest.raises(TypeError):
        ArrayFrameSource(np.zeros((4, 8, 8), np.float32))
    with pytest.raises(ValueError):
        ArrayFrameSource(np.zeros((0, 8, 8), np.uint8))
    with pytest.raises(ValueError):
        ArrayFrameSource(np.zeros((4, 8, 8, 2), np.uint8))
    with pytest.raises(ValueError):
        ArrayFrameSource(np.zeros((4, 8, 8), np.uint8), input_fps=0)
    with pytest.raises(ValueError):
        track(np.zeros((4, 8), np.uint8))  # missing the T axis


def test_single_channel_4d_accepted():
    frames, _ = _spiral_frames(seconds=1.0)
    _, ij_g = track(frames, start_location=IJ(50, 50), target_width=10)
    _, ij_1 = track(frames[..., None], start_location=IJ(50, 50), target_width=10)
    np.testing.assert_array_equal(ij_g, ij_1)


def test_open_source_array_dispatch():
    frames = np.random.default_rng(0).integers(0, 255, (6, 16, 20), np.uint8)
    src = open_source(frames, fps=24.0)
    assert isinstance(src, ArrayFrameSource)
    chunk = src.read_chunk(10)
    assert chunk.shape == (6, 16, 20)
    np.testing.assert_array_equal(chunk, frames)
    src.close()


class _LazyStack:
    """Duck-typed frame stack (h5py/zarr-shaped): indexable, shape/dtype, and
    NO bulk materialization — ``__array__`` raises to prove the source reads
    one frame at a time."""

    def __init__(self, arr):
        self._arr = arr
        self.shape = arr.shape
        self.dtype = arr.dtype
        self.reads = 0

    def __getitem__(self, idx):
        assert isinstance(idx, (int, np.integer)), f"non-scalar index {idx!r}"
        self.reads += 1
        return self._arr[idx]

    def __array__(self, *a, **k):
        raise AssertionError("lazy stack was bulk-materialized")


def test_lazy_stack_streams_one_frame_at_a_time():
    frames, _ = _spiral_frames(seconds=1.5)
    lazy = _LazyStack(frames)
    kw = dict(start_location=IJ(50, 50), target_width=10)
    _, ij_eager = track(frames, **kw)
    _, ij_lazy = track(lazy, **kw)
    np.testing.assert_array_equal(ij_lazy, ij_eager)
    assert lazy.reads == len(frames)  # each input frame read exactly once


def test_memmap_npy_stack(tmp_path):
    frames, _ = _spiral_frames(seconds=1.5)
    npy = str(tmp_path / "stack.npy")
    np.save(npy, frames)
    mm = np.load(npy, mmap_mode="r")
    kw = dict(start_location=IJ(50, 50), target_width=10)
    _, ij_eager = track(frames, **kw)
    _, ij_mm = track(mm, **kw)
    np.testing.assert_array_equal(ij_mm, ij_eager)


# -- zero-copy passthrough (serves_views) ------------------------------------


def test_zero_copy_views_match_resampler_fuzz():
    """The zero-copy passthrough (views of the backing array) must emit
    exactly the frames the per-frame resampler emits, across stop clamps
    and chunk sizes — differential fuzz, view-path vs forced-copy-path."""
    from fractions import Fraction

    rng = np.random.default_rng(9)
    T, h, w = 37, 8, 9
    frames = rng.integers(0, 255, size=(T, h, w)).astype(np.uint8)
    for fps in (24.0, 25.0, 30.0, 24000 / 1001, 30000 / 1001):
        # NTSC-style rates: m/fps and float(Fraction(m)/frac) differ by 1 ulp
        # for some m — include exact-boundary stops built BOTH ways so the
        # view path must match the resampler at every ulp edge
        frac_edges = [float(Fraction(k) / Fraction(fps).limit_denominator(1001000))
                      for k in (9, 17, T)]
        for stop in (np.inf, T / fps, (T - 3) / fps, 0.5, 17.21 / fps, 1e-9,
                     *frac_edges):
            a = ArrayFrameSource(frames, fps=fps, stop=stop)
            assert a.serves_views
            b = ArrayFrameSource(frames, fps=fps, stop=stop)
            b.serves_views = False  # force the exact per-frame resampler
            got, want = [], []
            while True:
                f = a.read_chunk(5)
                if f.shape[0] == 0:
                    break
                assert f.base is not None  # really a view
                got.append(f.copy())
            while True:
                f = b.read_chunk(5)
                if f.shape[0] == 0:
                    break
                want.append(f.copy())
            if want:
                np.testing.assert_array_equal(
                    np.concatenate(got), np.concatenate(want),
                    err_msg=f"fps={fps} stop={stop}")
            else:
                assert not got, f"fps={fps} stop={stop}"


def test_zero_copy_disabled_off_passthrough():
    frames = np.zeros((10, 8, 8), np.uint8)
    assert not ArrayFrameSource(frames, fps=24, input_fps=30).serves_views
    assert not ArrayFrameSource(frames, fps=24, start=0.5).serves_views
    assert not ArrayFrameSource(np.zeros((10, 8, 8, 3), np.uint8), fps=24).serves_views
    assert ArrayFrameSource(frames, fps=24, input_fps=24.0).serves_views


def test_zero_copy_track_leaves_array_untouched(tmp_path):
    """The recycle pool must never hand the user's array out as a write
    buffer: after a full track() the input frames are byte-identical."""
    frames, tra = _spiral_frames()
    snapshot = frames.copy()
    _, ij = track(frames, start_location=IJ(50, 50), target_width=10)
    np.testing.assert_array_equal(frames, snapshot)
    m = min(len(ij), len(tra))
    rmse = np.sqrt(np.mean(np.sum((np.asarray(ij)[:m] - tra[:m]) ** 2, axis=1)))
    assert rmse < 1.0


def test_zero_copy_batch_matches_single():
    frames, _ = _spiral_frames()
    kw = dict(start_location=IJ(50, 50), target_width=10)
    _, ij_single = track(frames, **kw)
    for ts_b, ij_b in track_batch([frames, frames], **kw):
        np.testing.assert_array_equal(ij_b, ij_single)
