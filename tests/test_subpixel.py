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
