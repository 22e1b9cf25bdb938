"""Unit tests for DoG kernel construction (reference: src/PawsomeTracker.jl:30,39-52)."""

import json
import math
import os

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

from pawsometracker_tpu.ops.dog_kernel import (
    FWHM_TO_SIGMA,
    default_gaussian_len,
    dog_kernel_2d,
    dog_kernel_separable,
    fix_window_size,
    gaussian_1d,
    get_sigma,
    guess_window_size,
)


def test_sigma_fwhm_convention():
    # sigma = target_width / (2*sqrt(2*ln2))
    assert get_sigma(25) == pytest.approx(25 / (2 * math.sqrt(2 * math.log(2))))
    # a Gaussian with this sigma has FWHM == target_width
    sigma = get_sigma(10.0)
    assert FWHM_TO_SIGMA * sigma == pytest.approx(10.0)


def test_gaussian_unit_sum_and_symmetry():
    g = gaussian_1d(2.3, 11)
    assert g.sum() == pytest.approx(1.0)
    np.testing.assert_allclose(g, g[::-1])
    assert g[5] == g.max()


def test_gaussian_matches_scipy():
    scipy_signal = pytest.importorskip("scipy.signal")
    sigma, length = 3.1, 15
    g = gaussian_1d(sigma, length)
    ref = scipy_signal.windows.gaussian(length, sigma)
    np.testing.assert_allclose(g, ref / ref.sum(), rtol=1e-12)


@pytest.mark.parametrize("tw", [5, 10, 25, 40])
@pytest.mark.parametrize("darker", [True, False])
def test_dog_kernel_properties(tw, darker):
    sigma = get_sigma(tw)
    k, length = dog_kernel_2d(sigma, darker)
    # support from the SURROUND gaussian's default window
    assert length == 4 * math.ceil(sigma * math.sqrt(2)) + 1
    assert k.shape == (length, length)
    # DoG of two unit-sum gaussians sums to ~0 -> affine intensity invariance
    assert abs(k.sum()) < 1e-6
    # symmetric in both axes
    np.testing.assert_allclose(k, k[::-1, :], atol=1e-12)
    np.testing.assert_allclose(k, k[:, ::-1], atol=1e-12)
    # center sign: center-minus-surround is positive at center; negated for darker
    assert (k[length // 2, length // 2] < 0) == darker


def test_dog_separable_consistent_with_2d():
    sigma = get_sigma(13)
    gc, gs, direction, length = dog_kernel_separable(sigma, True)
    k2d, l2 = dog_kernel_2d(sigma, True)
    assert length == l2
    recon = direction * (np.outer(gc, gc) - np.outer(gs, gs))
    np.testing.assert_allclose(recon, k2d, atol=1e-7)


def test_guess_window_size_uses_center_sigma():
    # reference src/PawsomeTracker.jl:64-68: l = 4*ceil(sigma)+1 with CENTER sigma
    for tw in (5, 10, 25):
        assert guess_window_size(tw) == 4 * math.ceil(get_sigma(tw)) + 1
    assert guess_window_size(25) % 2 == 1


def test_fix_window_size():
    # (w, h) -> (h, w); scalar l -> (l, l)  (reference src/PawsomeTracker.jl:70-72)
    assert fix_window_size((30, 20)) == (20, 30)
    assert fix_window_size(21) == (21, 21)
    assert fix_window_size([8, 6]) == (6, 8)
    with pytest.raises(ValueError):
        fix_window_size((1, 2, 3))


@pytest.mark.parametrize("tw", [6, 10, 25])
def test_dog_kernel_matches_golden_fixture(tw):
    """Byte-exact pin against an INDEPENDENT 50-digit-precision derivation of
    ImageFiltering.jl's Kernel.DoG (generator: fixtures/gen_dog_fixtures.py,
    derivation: docs/dog_kernel_derivation.md). Fails on ANY drift in sigma
    conversion, support, truncation, normalization, or sign."""
    fix = np.load(os.path.join(FIXTURES, f"dog_tw{tw}_f64.npy"))
    with open(os.path.join(FIXTURES, f"meta_tw{tw}.json")) as f:
        meta = json.load(f)
    k, length = dog_kernel_2d(get_sigma(tw), True)
    assert length == meta["length"]
    assert get_sigma(tw) == pytest.approx(meta["sigma"], rel=1e-14)
    # the float32 kernel must be the exact rounding of the true real values
    np.testing.assert_array_equal(k, fix.astype(np.float32))
    # lighter-target kernel is the exact negation
    k_light, _ = dog_kernel_2d(get_sigma(tw), False)
    np.testing.assert_array_equal(k_light, -fix.astype(np.float32))


def test_full_trace_matches_golden_fixture(tmp_path):
    """End-to-end drift pin: the tracked trajectory on the standard seed-0
    spiral clip must be IDENTICAL to the committed trace
    (generator: fixtures/gen_trace_fixture.py). Catches any behavior change in
    decode resampling, padding, window slice, argmax tie-break, or clamp."""
    import helpers

    from pawsometracker_tpu import IJ, track

    golden = np.load(os.path.join(FIXTURES, "trace_spiral.npy"))
    rng = np.random.default_rng(0)
    _, tra = helpers.build_trajectory(0.8 * 50, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra, str(tmp_path), 24, 100, 100, 10, True)
    ts, ij = track(f, fps=24, start_location=IJ(50, 50), target_width=10)
    np.testing.assert_array_equal(np.asarray(ij, np.int32), golden)


def test_default_gaussian_len_odd():
    for s in (0.5, 1.0, 2.2, 7.9):
        length = default_gaussian_len(s)
        assert length % 2 == 1
        assert length == 4 * math.ceil(s) + 1
