"""Core tracker-step and scan tests on synthetic frames (no video I/O).

Validates the hot loop against the reference semantics
(reference: src/PawsomeTracker.jl:55-62) and against a scipy-based oracle.
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from pawsometracker_tpu.models.dog_tracker import (
    autodetect_spec,
    center_guess,
    make_spec,
    tracker_fns,
)
from pawsometracker_tpu.ops.dog_kernel import dog_kernel_2d
from pawsometracker_tpu.ops.filters import (
    argmax_colmajor,
    correlate2d_valid,
    mode_u8,
    mode_u8_host,
    separable_correlate_valid,
)


def draw_blob(h, w, ij, radius, dark=True, bg=128):
    """Filled-circle target on a uniform background, uint8."""
    img = np.full((h, w), bg, np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    mask = (yy - ij[0]) ** 2 + (xx - ij[1]) ** 2 <= radius**2
    img[mask] = 0 if dark else 255
    return img


def scipy_step(frame_u8, pos, spec):
    """Oracle: full-frame DoG correlation with constant-mode padding, windowed argmax."""
    k, L = dog_kernel_2d(spec.sigma, spec.darker_target)
    fill = mode_u8_host(frame_u8)
    ri, rj = spec.radii
    h, w = frame_u8.shape
    # windowed argmax over [pos-r, pos+r] with out-of-frame window cells evaluated
    # against the padded response
    pad = (ri + L, rj + L)
    respp = ndi.correlate(
        np.pad(frame_u8.astype(np.float64), ((pad[0], pad[0]), (pad[1], pad[1])), constant_values=fill),
        k.astype(np.float64),
        mode="nearest",
    )[pad[0] - ri : pad[0] + h + ri, pad[1] - rj : pad[1] + w + rj]
    win = respp[pos[0] : pos[0] + 2 * ri + 1, pos[1] : pos[1] + 2 * rj + 1]
    # column-major first max
    kidx = np.argmax(win.T.ravel())
    col, row = divmod(kidx, win.shape[0])
    new = (pos[0] - ri + row, pos[1] - rj + col)
    return (min(max(new[0], 0), h - 1), min(max(new[1], 0), w - 1))


def test_correlate2d_matches_scipy(rng):
    x = rng.random((40, 37)).astype(np.float32)
    k = rng.random((7, 7)).astype(np.float32)
    got = np.asarray(correlate2d_valid(jnp.asarray(x), jnp.asarray(k)))
    want = ndi.correlate(x.astype(np.float64), k.astype(np.float64))[3:-3, 3:-3]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_separable_matches_2d(rng):
    x = rng.random((33, 29)).astype(np.float32)
    g1 = rng.random(9).astype(np.float32)
    g2 = rng.random(9).astype(np.float32)
    got = np.asarray(separable_correlate_valid(jnp.asarray(x), jnp.asarray(g1), jnp.asarray(g2)))
    want = np.asarray(correlate2d_valid(jnp.asarray(x), jnp.asarray(np.outer(g1, g2))))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_argmax_colmajor_tiebreak():
    x = np.zeros((3, 4), np.float32)
    x[2, 1] = 5.0
    x[0, 2] = 5.0  # same max; column-major order visits col 1 before col 2
    row, col = np.asarray(argmax_colmajor(jnp.asarray(x)))
    assert (row, col) == (2, 1)
    x2 = np.zeros((3, 4), np.float32)
    x2[1, 0] = 2.0
    x2[2, 0] = 2.0  # same column: smaller row wins
    row, col = np.asarray(argmax_colmajor(jnp.asarray(x2)))
    assert (row, col) == (1, 0)


def test_mode_u8(rng):
    x = rng.integers(0, 256, size=(50, 50)).astype(np.uint8)
    x[:20] = 77
    assert mode_u8_host(x) == 77
    assert int(mode_u8(jnp.asarray(x))) == 77
    # tie -> StatsBase semantics: first value to REACH the max count in
    # column-major scan order wins (reference: src/PawsomeTracker.jl:47-48).
    y = np.array([3, 3, 9, 9], np.uint8)
    assert mode_u8_host(y) == 3
    assert int(mode_u8(jnp.asarray(y))) == 3
    # Higher byte completes its count first -> it wins (lowest-byte would say 10).
    z = np.array([[200, 10], [200, 10]], np.uint8)  # F-order: 200,200,10,10
    assert mode_u8_host(z) == 200
    assert int(mode_u8(jnp.asarray(z))) == 200
    # Scan order is Fortran (column-major over the H×W view), not row-major:
    # F-order gives 10 its 3rd occurrence first; C-order would pick 200.
    w = np.array([[10, 10, 200, 200], [200, 10, 7, 7]], np.uint8)
    assert mode_u8_host(w) == 10
    assert int(mode_u8(jnp.asarray(w))) == 10
    # w in C-order really is a different answer (guards the order claim above)
    flat_c = w.ravel(order="C")
    assert np.flatnonzero(flat_c == 200)[2] < np.flatnonzero(flat_c == 10)[2]


@pytest.mark.parametrize("dark", [True, False])
def test_snap_finds_blob(dark):
    h, w = 120, 160
    true_ij = (60, 85)
    frame = draw_blob(h, w, true_ij, radius=5, dark=dark)
    spec = make_spec((h, w), 41, target_width=10, darker_target=dark)
    fns = tracker_fns(spec)
    fill = mode_u8_host(frame)
    pos = np.asarray(fns.snap(jnp.asarray(frame), jnp.array([55, 80], np.int32), np.uint8(fill)))
    assert abs(pos[0] - true_ij[0]) <= 1 and abs(pos[1] - true_ij[1]) <= 1


def test_snap_matches_scipy_oracle(rng):
    h, w = 90, 110
    frame = (rng.random((h, w)) * 255).astype(np.uint8)
    frame[40:48, 60:68] = 0  # dark blob in noise
    spec = make_spec((h, w), (25, 31), target_width=8, darker_target=True)
    fns = tracker_fns(spec)
    fill = mode_u8_host(frame)
    for guess in [(45, 62), (10, 10), (0, 0), (89, 109), (44, 100)]:
        got = tuple(np.asarray(fns.snap(jnp.asarray(frame), jnp.array(guess, np.int32), np.uint8(fill))))
        want = scipy_step(frame, guess, spec)
        assert got == want, f"guess={guess}: got {got} want {want}"


def test_scan_follows_moving_blob():
    h, w = 100, 100
    T = 40
    path = [(30 + t, 20 + t) for t in range(T)]  # diagonal motion, 1 px/frame
    frames = np.stack([draw_blob(h, w, ij, radius=4) for ij in path])
    spec = make_spec((h, w), 21, target_width=8, darker_target=True)
    fns = tracker_fns(spec)
    fill = mode_u8_host(frames[0])
    pos0 = jnp.array(path[0], np.int32)
    positions = np.asarray(fns.scan(jnp.asarray(frames), pos0, np.uint8(fill)))
    err = np.abs(positions - np.array(path))
    assert err.max() <= 1


def test_scan_batch_vmap():
    h, w = 64, 64
    T, B = 10, 3
    paths = [[(20 + t, 20 + b * 5 + t) for t in range(T)] for b in range(B)]
    frames = np.stack([np.stack([draw_blob(h, w, ij, 3) for ij in p]) for p in paths])
    spec = make_spec((h, w), 15, target_width=6, darker_target=True)
    fns = tracker_fns(spec)
    fills = np.array([mode_u8_host(frames[b, 0]) for b in range(B)], np.uint8)
    pos0 = jnp.array([p[0] for p in paths], np.int32)
    out = np.asarray(fns.scan_batch(jnp.asarray(frames), pos0, jnp.asarray(fills)))
    for b in range(B):
        err = np.abs(out[b] - np.array(paths[b]))
        assert err.max() <= 1


def test_autodetect_center_and_spec():
    spec = make_spec((200, 320), 21, 25, True)
    aspec = autodetect_spec(spec)
    # quarter-frame window (reference src/PawsomeTracker.jl:102)
    assert aspec.window_size == (50, 80)
    # 0-based center: julia sz.div(2) 1-based == sz//2 - 1 0-based
    assert center_guess((100, 100)) == (49, 49)
    assert center_guess((101, 100)) == (49, 49)


def test_autodetect_finds_far_blob():
    # the auto-detect window is quarter-frame, so the target must lie within
    # radii = (h//8, w//8) of the frame center (same limitation as the reference)
    h, w = 160, 160
    true_ij = (65, 95)
    frame = draw_blob(h, w, true_ij, radius=6, dark=True)
    spec = make_spec((h, w), 21, target_width=12, darker_target=True)
    fns = tracker_fns(autodetect_spec(spec))
    fill = mode_u8_host(frame)
    pos = np.asarray(
        fns.snap(jnp.asarray(frame), jnp.array(center_guess((h, w)), np.int32), np.uint8(fill))
    )
    assert abs(pos[0] - true_ij[0]) <= 1 and abs(pos[1] - true_ij[1]) <= 1


def test_clamped_at_edges():
    h, w = 50, 60
    frame = draw_blob(h, w, (2, 2), radius=3)
    spec = make_spec((h, w), 31, target_width=8, darker_target=True)
    fns = tracker_fns(spec)
    fill = mode_u8_host(frame)
    pos = np.asarray(fns.snap(jnp.asarray(frame), jnp.array([0, 0], np.int32), np.uint8(fill)))
    assert 0 <= pos[0] < h and 0 <= pos[1] < w
    assert abs(pos[0] - 2) <= 2 and abs(pos[1] - 2) <= 2


def test_make_spec_rejects_nonpositive_target_width():
    """target_width <= 0 means sigma = 0: an identically-zero DoG kernel
    that silently marches every track to the frame corner (review finding)."""
    from pawsometracker_tpu.models.dog_tracker import make_spec

    with pytest.raises(ValueError, match="target_width"):
        make_spec((100, 100), 21, 0, True)
    with pytest.raises(ValueError, match="target_width"):
        make_spec((100, 100), 21, -3.0, True)
    with pytest.raises(ValueError, match="window_size"):
        make_spec((100, 100), 0, 10, True)


def test_sharded_tracker_rejects_bad_engine_requests():
    """engine='pallas' must fail at construction when it can't be honored:
    with a mesh it would silently run vmapped XLA, and on a non-TPU backend
    jit laziness deferred the failure to a cryptic Mosaic error (review
    finding)."""
    import jax
    import pytest as _pytest

    from pawsometracker_tpu.models.dog_tracker import make_spec
    from pawsometracker_tpu.parallel.mesh import ShardedBatchTracker, make_mesh

    spec = make_spec((100, 100), 21, 10, True)
    with _pytest.raises(ValueError, match="mesh"):
        ShardedBatchTracker(spec, make_mesh(2), engine="pallas")
    if jax.default_backend() != "tpu":
        with _pytest.raises(ValueError, match="TPU backend"):
            ShardedBatchTracker(spec, None, engine="pallas")
