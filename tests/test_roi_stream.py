"""ROI streaming scan: must produce IDENTICAL positions to full-frame
streaming (the crop provably contains every window the scan can visit)."""

import numpy as np
import pytest

from pawsometracker_tpu import IJ, track
from pawsometracker_tpu.api import _crop_with_fill, _roi_geometry
from pawsometracker_tpu.models.dog_tracker import make_spec

import helpers


def test_roi_geometry():
    spec = make_spec((1080, 1920), 41, 25, True)
    ch, cw, (mi, mj) = _roi_geometry(spec, 8)
    ri = 20
    half = spec.kernel_len // 2
    assert mi == 8 * ri + half
    assert ch == 2 * mi + 1 and cw == 2 * mj + 1


def test_crop_with_fill():
    f = np.arange(100, dtype=np.uint8).reshape(10, 10)
    c = _crop_with_fill(f, (-2, 3), 6, 6, fill=7)
    assert c.shape == (6, 6)
    assert (c[:2] == 7).all()
    assert c[2, 0] == f[0, 3]
    c2 = _crop_with_fill(f, (8, 8), 6, 6, fill=9)
    assert c2[0, 0] == f[8, 8]
    assert (c2[2:] == 9).all() and (c2[:, 2:] == 9).all()


@pytest.mark.parametrize("start_ij", [(50, 50), (20, 80)])
def test_roi_matches_full(tmp_path, start_ij):
    rng = np.random.default_rng(21)
    _, tra = helpers.build_trajectory(28, 24, start_ij, rng)
    f = helpers.trajectory2video(tra, str(tmp_path), 24, 100, 100, 10, True)
    kw = dict(fps=24, start_location=IJ(*start_ij), target_width=10)
    ts_f, ij_f = track(f, stream="full", **kw)
    ts_r, ij_r = track(f, stream="roi", roi_frames=4, **kw)
    np.testing.assert_array_equal(ij_r, ij_f)
    np.testing.assert_allclose(ts_r, ts_f)


def test_roi_near_edges(tmp_path):
    """Target hugging frame edges: clamp semantics must match the full path."""
    import cv2

    h, w, T = 80, 80, 40
    frames = []
    path = []
    for t in range(T):
        ij = (max(2, 30 - t), max(2, 30 - t))  # runs into the top-left corner
        path.append(ij)
        img = np.full((h, w), 128, np.uint8)
        cv2.circle(img, (ij[1], ij[0]), 4, 0, -1)
        frames.append(img)
    f = helpers.write_video(frames, str(tmp_path / "edge"), 24)
    kw = dict(fps=24, start_location=IJ(30, 30), target_width=8)
    _, ij_f = track(f, stream="full", **kw)
    _, ij_r = track(f, stream="roi", roi_frames=4, **kw)
    np.testing.assert_array_equal(ij_r, ij_f)
    assert (ij_f >= 0).all()


def test_roi_auto_selection():
    # auto picks ROI only when the crop is much smaller than the frame
    spec_big = make_spec((1080, 1920), 41, 25, True)
    ch, cw, _ = _roi_geometry(spec_big, 8)
    assert ch * cw * 2 < 1080 * 1920
    spec_small = make_spec((100, 100), 21, 10, True)
    ch2, cw2, _ = _roi_geometry(spec_small, 8)
    assert not (ch2 * cw2 * 2 < 100 * 100)
