"""Sub-pixel refinement (extension beyond the reference's integer positions):
parabolic peak interpolation must not hurt, and typically improves, RMSE."""

import numpy as np
import pytest

from pawsometracker_tpu import IJ, track

import helpers


def test_subpixel_returns_floats_in_bounds(tmp_path):
    rng = np.random.default_rng(51)
    _, tra = helpers.build_trajectory(30, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra, str(tmp_path), 24, 100, 100, 10, True)
    ts, ij = track(f, fps=24, start_location=IJ(50, 50), target_width=10, subpixel=True)
    assert ij.dtype == np.float64
    assert len(ij) == len(tra)
    assert (ij >= 0).all() and (ij[:, 0] <= 99).all() and (ij[:, 1] <= 99).all()
    # offsets are bounded by half a pixel around the integer path
    ts_i, ij_i = track(f, fps=24, start_location=IJ(50, 50), target_width=10)
    assert np.abs(ij - ij_i).max() <= 0.5 + 1e-9


def test_subpixel_accuracy_not_worse(tmp_path):
    rng = np.random.default_rng(52)
    _, tra = helpers.build_trajectory(30, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra, str(tmp_path), 24, 100, 100, 10, True)
    _, ij_i = track(f, fps=24, start_location=IJ(50, 50), target_width=10)
    _, ij_s = track(f, fps=24, start_location=IJ(50, 50), target_width=10, subpixel=True)
    truth = np.asarray(tra[: len(ij_i)], float)
    rmse_i = np.sqrt(np.mean(np.sum((ij_i - truth) ** 2, axis=1)))
    rmse_s = np.sqrt(np.mean(np.sum((ij_s - truth) ** 2, axis=1)))
    assert rmse_s <= rmse_i + 0.1
    assert rmse_s < 1.0


@pytest.mark.parametrize("stream", ["roi", "full"])
def test_subpixel_stream_modes_agree(tmp_path, stream):
    rng = np.random.default_rng(53)
    _, tra = helpers.build_trajectory(28, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra[:60], str(tmp_path), 24, 100, 100, 10, True)
    _, ij_a = track(
        f, fps=24, start_location=IJ(50, 50), target_width=10, subpixel=True, stream=stream,
        roi_frames=4,
    )
    _, ij_b = track(
        f, fps=24, start_location=IJ(50, 50), target_width=10, subpixel=True, stream="full"
    )
    np.testing.assert_allclose(ij_a, ij_b, atol=1e-5)


@pytest.mark.parametrize("stream", ["roi", "full"])
def test_batch_subpixel_matches_single(tmp_path, stream):
    """track_batch(subpixel=True) must equal per-video track(subpixel=True)
    on both stream modes (ROI pipeline carries offsets through chaining,
    validation, and replay; full-frame path through the vmapped scan_sub)."""
    from pawsometracker_tpu.batch import track_batch

    rng = np.random.default_rng(54)
    fs = []
    for s, seed_start in enumerate([(50, 50), (30, 60)]):
        _, tra = helpers.build_trajectory(25, 24, seed_start, rng)
        d = tmp_path / f"v{s}"
        d.mkdir()
        fs.append(helpers.trajectory2video(tra, str(d), 24, 100, 100, 10, True))
    kw = dict(fps=24, target_width=10, subpixel=True, stream=stream)
    singles = [track(f, start_location=IJ(50, 50) if i == 0 else IJ(30, 60), **kw)
               for i, f in enumerate(fs)]
    results = track_batch(fs, start_location=[IJ(50, 50), IJ(30, 60)], **kw)
    for (ts_s, ij_s), (ts_b, ij_b) in zip(singles, results):
        assert ij_b.dtype == np.float64
        np.testing.assert_allclose(ij_b, ij_s, atol=1e-9)
        np.testing.assert_allclose(ts_b, ts_s)


def test_multi_subpixel_matches_single(tmp_path):
    """track_multi(subpixel=True): each target's float path equals its own
    single-target subpixel track when targets are far apart."""
    from pawsometracker_tpu.multi import track_multi

    rng = np.random.default_rng(55)
    n = 25
    _, tra1 = helpers.build_trajectory(n, 24, (30, 30), rng)
    _, tra2 = helpers.build_trajectory(n, 24, (90, 130), rng)
    import cv2

    frames = []
    for p1, p2 in zip(tra1, tra2):
        f = np.full((120, 160), 128, np.uint8)
        cv2.circle(f, (int(round(p1[1])), int(round(p1[0]))), 5, 0, -1)
        cv2.circle(f, (int(round(p2[1])), int(round(p2[0]))), 5, 0, -1)
        frames.append(f)
    path = helpers.write_video(frames, str(tmp_path / "m"), 24, codec="FFV1")
    kw = dict(fps=24, target_width=10)
    ts, pos = track_multi(path, [IJ(30, 30), IJ(90, 130)], subpixel=True, **kw)
    assert pos.dtype == np.float64
    _, s1 = track(path, start_location=IJ(30, 30), subpixel=True, **kw)
    _, s2 = track(path, start_location=IJ(90, 130), subpixel=True, **kw)
    np.testing.assert_allclose(pos[:, 0], s1, atol=1e-9)
    np.testing.assert_allclose(pos[:, 1], s2, atol=1e-9)
