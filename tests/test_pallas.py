"""Fused Pallas tracker-kernel tests (interpret mode on CPU; the compiled
path is exercised on real TPU hardware by bench.py and the TPU validation
script)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pawsometracker_tpu.models.dog_tracker import make_spec, tracker_fns
from pawsometracker_tpu.ops.pallas_tracker import (
    banded_correlation_matrix,
    pallas_scan_fn,
)

from test_tracker_core import draw_blob


def test_banded_matrix_correlates(rng):
    g = rng.random(5).astype(np.float32)
    x = rng.random((12, 7)).astype(np.float32)
    B = banded_correlation_matrix(g, 8)
    got = B @ x
    want = np.stack([(x[a : a + 5] * g[:, None]).sum(axis=0) for a in range(8)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def draw_blob_aniso(h, w, ij, ry, rx, bg=128):
    """Filled-ellipse target: anisotropic so the DoG response has NO exact
    symmetry ties. A circular blob clipped by the frame corner produces
    bit-exact response ties across the diagonal, and exact ties are not
    stable across differently-compiled programs (XLA may fuse/accumulate the
    same dots differently per program) — the engines legitimately disagree
    by 1 px there. Tie-break SEMANTICS are pinned by
    test_argmax_colmajor_tiebreak on a single program; this test pins the
    kernel logic (DMA alignment, VMEM rotation, SMEM chaining, clamps)."""
    img = np.full((h, w), bg, np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    mask = ((yy - ij[0]) / ry) ** 2 + ((xx - ij[1]) / rx) ** 2 <= 1.0
    img[mask] = 0
    return img


@pytest.mark.parametrize("start", [(30, 20), (1, 1), (95, 95), (50, 3)])
def test_interpret_scan_matches_jax(start):
    h, w, T = 100, 100, 12
    path = [(min(start[0] + t, h - 3), min(start[1] + t, w - 3)) for t in range(T)]
    frames = np.stack([draw_blob_aniso(h, w, ij, 4, 3) for ij in path])
    spec = make_spec((h, w), 21, 8, True)
    want = np.asarray(
        tracker_fns(spec).scan(jnp.asarray(frames), jnp.array(start, np.int32), np.uint8(128))
    )
    fn = pallas_scan_fn(spec, interpret=True)
    got = np.asarray(fn(jnp.asarray(frames), jnp.array(start, np.int32), np.uint8(128)))
    np.testing.assert_array_equal(got, want)


def test_interpret_batched_matches_jax():
    h, w, T, B = 80, 90, 8, 3
    paths = [[(20 + b * 5 + t, 30 + t) for t in range(T)] for b in range(B)]
    frames = np.stack([np.stack([draw_blob(h, w, ij, 3) for ij in p]) for p in paths])
    spec = make_spec((h, w), 15, 6, True)
    pos0 = np.array([p[0] for p in paths], np.int32)
    want = np.asarray(
        tracker_fns(spec).scan_batch(
            jnp.asarray(frames), jnp.asarray(pos0), jnp.full((B,), 128, np.uint8)
        )
    )
    fn = pallas_scan_fn(spec, batched=True, interpret=True)
    got = np.asarray(fn(jnp.asarray(frames), jnp.asarray(pos0), np.uint8(128)))
    np.testing.assert_array_equal(got, want)


def test_interpret_batched_per_video_fills():
    h, w, T, B = 64, 64, 5, 2
    frames = np.stack(
        [
            np.stack([draw_blob(h, w, (20 + t, 20 + t), 3, bg=100) for t in range(T)]),
            np.stack([draw_blob(h, w, (30 + t, 30 + t), 3, bg=200) for t in range(T)]),
        ]
    )
    fills = np.array([100, 200], np.uint8)
    spec = make_spec((h, w), 15, 6, True)
    pos0 = np.array([[20, 20], [30, 30]], np.int32)
    want = np.asarray(
        tracker_fns(spec).scan_batch(jnp.asarray(frames), jnp.asarray(pos0), jnp.asarray(fills))
    )
    fn = pallas_scan_fn(spec, batched=True, interpret=True)
    got = np.asarray(fn(jnp.asarray(frames), jnp.asarray(pos0), jnp.asarray(fills)))
    np.testing.assert_array_equal(got, want)


def test_interpret_lighter_target():
    h, w, T = 64, 64, 6
    path = [(30, 20 + 2 * t) for t in range(T)]
    frames = np.stack([draw_blob(h, w, ij, 4, dark=False) for ij in path])
    spec = make_spec((h, w), 17, 8, False)
    want = np.asarray(
        tracker_fns(spec).scan(jnp.asarray(frames), jnp.array(path[0], np.int32), np.uint8(128))
    )
    fn = pallas_scan_fn(spec, interpret=True)
    got = np.asarray(fn(jnp.asarray(frames), jnp.array(path[0], np.int32), np.uint8(128)))
    np.testing.assert_array_equal(got, want)


def test_interpret_bounded_matches_jax():
    """Bounded (ROI) kernel variant: dynamic clamp box from scalar prefetch."""
    ch, cw, T = 97, 97, 8
    path = [(48 + t, 48 + t) for t in range(T)]
    crops = np.stack([draw_blob(ch, cw, ij, 4) for ij in path])
    spec = make_spec((ch, cw), 21, 8, True)
    deltas = np.zeros((T, 2), np.int32)
    lo = np.tile(np.array([[5, 0]], np.int32), (T, 1))
    hi = np.tile(np.array([[90, 80]], np.int32), (T, 1))
    want = np.asarray(
        tracker_fns(spec).scan_bounded(
            jnp.asarray(crops), jnp.array(path[0], np.int32), np.uint8(128),
            jnp.asarray(deltas), jnp.asarray(lo), jnp.asarray(hi),
        )
    )
    fn = pallas_scan_fn(spec, bounded=True, interpret=True)
    got = np.asarray(
        fn(jnp.asarray(crops), jnp.array(path[0], np.int32), np.uint8(128),
           jnp.asarray(deltas), jnp.asarray(lo), jnp.asarray(hi))
    )
    np.testing.assert_array_equal(got, want)


def test_interpret_batched_bounded_matches_jax():
    """Batched bounded variant (grid (B, T)) — the batch/multi ROI-path engine
    wired by pipeline._select_batched_bounded: per-video clamp boxes and fills
    ride the scalar-prefetch array."""
    import jax

    ch, cw, T, B = 81, 89, 6, 3
    paths = [[(30 + 4 * b + t, 40 + t) for t in range(T)] for b in range(B)]
    crops = np.stack(
        [np.stack([draw_blob(ch, cw, ij, 4, bg=90 + 40 * b) for ij in p])
         for b, p in enumerate(paths)]
    )
    spec = make_spec((ch, cw), 19, 8, True)
    pos0 = np.array([p[0] for p in paths], np.int32)
    fills = np.array([90, 130, 170], np.uint8)
    deltas = np.zeros((B, T, 2), np.int32)
    lo = np.tile(np.array([[0, 0], [2, 1], [0, 3]], np.int32)[:, None], (1, T, 1))
    hi = np.tile(np.array([[80, 88], [70, 85], [78, 80]], np.int32)[:, None], (1, T, 1))
    base = tracker_fns(spec).scan_bounded
    want = np.asarray(
        jax.vmap(getattr(base, "__wrapped__", base))(
            jnp.asarray(crops), jnp.asarray(pos0), jnp.asarray(fills),
            jnp.asarray(deltas), jnp.asarray(lo), jnp.asarray(hi),
        )
    )
    fn = pallas_scan_fn(spec, batched=True, bounded=True, interpret=True)
    got = np.asarray(
        fn(jnp.asarray(crops), jnp.asarray(pos0), jnp.asarray(fills),
           jnp.asarray(deltas), jnp.asarray(lo), jnp.asarray(hi))
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("batched", [False, True])
def test_interpret_subpixel_matches_jax(batched, rng):
    """Fused bounded+subpixel kernel: positions must equal the XLA scan_sub
    exactly; parabolic offsets agree to float tolerance (the two engines sum
    the DoG response in different orders)."""
    ch, cw, T = 64, 64, 6
    spec = make_spec((ch, cw), 15, 6, True)
    path = [(30 + t, 28 + 2 * t) for t in range(T)]
    frames = np.stack([draw_blob(ch, cw, ij, 3) for ij in path]).astype(np.uint8)
    # off-grid shading so offsets are non-trivial
    frames = np.clip(frames.astype(np.int32) + rng.integers(-3, 4, frames.shape), 0, 255).astype(np.uint8)
    fns = tracker_fns(spec)
    if batched:
        B = 2
        fb = np.stack([frames, frames[:, ::-1].copy()])
        pos0 = np.tile(np.array([[30, 28]], np.int32), (B, 1))
        deltas = np.zeros((B, T, 2), np.int32)
        lo = np.zeros((B, T, 2), np.int32)
        hi = np.tile(np.array([[[ch - 1, cw - 1]]], np.int32), (B, T, 1))
        fills = np.full((B,), 128, np.uint8)
        import jax

        base = getattr(fns.scan_sub, "__wrapped__", fns.scan_sub)
        want_p, want_o = jax.jit(jax.vmap(base))(
            jnp.asarray(fb), jnp.asarray(pos0), jnp.asarray(fills),
            jnp.asarray(deltas), jnp.asarray(lo), jnp.asarray(hi)
        )
        fn = pallas_scan_fn(spec, batched=True, bounded=True, subpixel=True, interpret=True)
        got_p, got_o = fn(jnp.asarray(fb), jnp.asarray(pos0), jnp.asarray(fills),
                          jnp.asarray(deltas), jnp.asarray(lo), jnp.asarray(hi))
    else:
        pos0 = np.array([30, 28], np.int32)
        deltas = np.zeros((T, 2), np.int32)
        lo = np.zeros((T, 2), np.int32)
        hi = np.tile(np.array([[ch - 1, cw - 1]], np.int32), (T, 1))
        want_p, want_o = fns.scan_sub(
            jnp.asarray(frames), jnp.asarray(pos0), np.uint8(128),
            jnp.asarray(deltas), jnp.asarray(lo), jnp.asarray(hi)
        )
        fn = pallas_scan_fn(spec, bounded=True, subpixel=True, interpret=True)
        got_p, got_o = fn(jnp.asarray(frames), jnp.asarray(pos0), np.uint8(128),
                          jnp.asarray(deltas), jnp.asarray(lo), jnp.asarray(hi))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))
    assert np.abs(np.asarray(got_o)).max() > 0  # offsets are non-trivial
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o), atol=1e-4)


def test_subpixel_requires_bounded():
    spec = make_spec((32, 32), 9, 6, True)
    with pytest.raises(ValueError, match="bounded"):
        pallas_scan_fn(spec, subpixel=True)


def test_out_of_crop_start_is_defined(rng):
    """A chained mispredict can hand the bounded kernel a start position far
    outside the crop; the entry clamp must keep every DMA origin legal and
    every output position in-frame (review finding: interpret mode clamps
    OOB slices silently, hardware does not — so this pins the EXPLICIT
    clamp by asserting outputs stay in range even for garbage starts)."""
    ch, cw, T = 97, 97, 4
    crops = np.stack([draw_blob(ch, cw, (48, 48), 4) for _ in range(T)])
    spec = make_spec((ch, cw), 21, 8, True)
    deltas = np.zeros((T, 2), np.int32)
    lo = np.zeros((T, 2), np.int32)
    hi = np.tile(np.array([[ch - 1, cw - 1]], np.int32), (T, 1))
    fn = pallas_scan_fn(spec, bounded=True, interpret=True)
    for start in [(-50, -120), (300, 48), (48, 500), (-1, cw + 1)]:
        got = np.asarray(
            fn(jnp.asarray(crops), jnp.array(start, np.int32), np.uint8(128),
               jnp.asarray(deltas), jnp.asarray(lo), jnp.asarray(hi))
        )
        assert (got >= 0).all() and (got[:, 0] < ch).all() and (got[:, 1] < cw).all(), (
            start, got,
        )


def test_interpret_per_frame_deltas_match_jax():
    """Per-frame crop origins: each frame cropped at its own origin along a
    moving path, carried position rebased by deltas — Pallas and XLA scans
    must agree, and both must equal a fixed-origin scan of the same content
    (the rebase is a pure coordinate change)."""
    from pawsometracker_tpu.pipeline import _crop_with_fill

    H, W, T = 240, 260, 6
    path = [(60 + 6 * t, 70 + 9 * t) for t in range(T)]
    frames = np.stack([draw_blob(H, W, ij, 5) for ij in path])
    spec_full = make_spec((H, W), 21, 10, True)
    # full-frame oracle
    want_abs = np.asarray(
        tracker_fns(spec_full).scan(
            jnp.asarray(frames), jnp.array(path[0], np.int32), np.uint8(128)
        )
    )
    # per-frame origins follow the true path; generous margin
    ch = cw = 97
    m = 48
    origins = np.array([[i - m, j - m] for i, j in path], np.int64)
    crops = np.stack([
        _crop_with_fill(frames[t], origins[t], ch, cw, 128) for t in range(T)
    ])
    spec = make_spec((ch, cw), 21, 10, True)
    deltas = np.empty((T, 2), np.int64)
    deltas[0] = 0
    deltas[1:] = origins[:-1] - origins[1:]
    lo = np.maximum(-origins, 0).astype(np.int32)
    hi = np.minimum([ch - 1, cw - 1], np.array([H - 1, W - 1]) - origins).astype(np.int32)
    pos0 = (np.array(path[0]) - origins[0]).astype(np.int32)
    want_rel = np.asarray(
        tracker_fns(spec).scan_bounded(
            jnp.asarray(crops), jnp.asarray(pos0), np.uint8(128),
            jnp.asarray(deltas, np.int32), jnp.asarray(lo), jnp.asarray(hi),
        )
    )
    np.testing.assert_array_equal(want_rel + origins, want_abs)
    fn = pallas_scan_fn(spec, bounded=True, interpret=True)
    got = np.asarray(
        fn(jnp.asarray(crops), jnp.asarray(pos0), np.uint8(128),
           jnp.asarray(deltas, np.int32), jnp.asarray(lo), jnp.asarray(hi))
    )
    np.testing.assert_array_equal(got, want_rel)


def test_engine_measurement_runs_tie_stress(monkeypatch, tmp_path):
    """pick_bounded_engine's measurement must run the argmax-tie geometries
    (flat field + mirror-symmetric blob) through BOTH engines and record the
    verdict: pallas may only win with tie_parity True (VERDICT r3 item 5).
    Run on CPU by spoofing the backend gate and forcing interpret-mode
    pallas — interpret lowers to the same XLA dots as the XLA engine, so
    parity (including ties) must hold here by construction."""
    import functools

    import jax

    from pawsometracker_tpu import pipeline as pl
    from pawsometracker_tpu.ops import pallas_tracker as pt

    monkeypatch.setenv("PAWSOMETRACKER_CACHE", str(tmp_path))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    real = pt.pallas_scan_fn
    monkeypatch.setattr(pt, "pallas_scan_fn", functools.partial(real, interpret=True))
    monkeypatch.setattr(pl, "_session_engine_cache", {})

    spec = make_spec((33, 33), 15, 6, True)
    eng, info = pl.pick_bounded_engine(spec, 4)
    assert info.get("parity") is True, info
    assert info.get("tie_parity") is True, info  # interpret == XLA dot order
    # and the batched chooser runs the same gate
    engb, infob = pl.pick_bounded_engine_batch(spec, 4, 2)
    assert infob.get("parity") is True, infob
    assert infob.get("tie_parity") is True, infob


def test_engine_measurement_tie_divergence_pins_xla(monkeypatch, tmp_path):
    """A pallas kernel that flips an argmax on tie geometries (simulated by
    mirroring the scan output's column axis tie-break via a doctored kernel
    wrapper) must be pinned to XLA even if it times faster."""
    import functools

    import jax

    from pawsometracker_tpu import pipeline as pl
    from pawsometracker_tpu.ops import pallas_tracker as pt

    monkeypatch.setenv("PAWSOMETRACKER_CACHE", str(tmp_path))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pl, "_session_engine_cache", {})

    real = pt.pallas_scan_fn

    def doctored(spec_, **kw):
        fn = functools.partial(real, interpret=True)(spec_, **kw)

        def wrapped(crops, pos, fill, deltas, lo, hi):
            out = fn(crops, pos, fill, deltas, lo, hi)
            # perturb results ONLY on a flat (tie) input: mimics an engine
            # whose reduction order breaks ties differently
            flat = jnp.all(crops == crops.reshape(-1)[0])
            return jnp.where(flat, jnp.minimum(out + 1, 32), out)

        return wrapped

    monkeypatch.setattr(pt, "pallas_scan_fn", doctored)
    spec = make_spec((33, 33), 15, 6, True)
    eng, info = pl.pick_bounded_engine(spec, 4)
    assert info.get("parity") is True, info  # asymmetric probe still agrees
    assert info.get("tie_parity") is False, info
    assert eng == "xla"


def test_randomized_tie_geometries_parity(rng):
    """Randomized hardening of the tie gate: symmetric blobs, flat fields,
    plateaus and mirror-duplicated noise all create exact response ties;
    interpret-mode pallas (same XLA dots as the XLA engine) must agree on
    every argmax. Catches tie-sensitive drift in either scan's reduction
    structure before the hardware gate would."""
    import jax.numpy as jnp

    ch = cw = 41
    K = 4
    spec = make_spec((ch, cw), 15, 6, True)
    fns = tracker_fns(spec)
    pal = pallas_scan_fn(spec, bounded=True, interpret=True)
    deltas = np.zeros((K, 2), np.int32)
    lo = np.zeros((K, 2), np.int32)
    hi = np.tile(np.array([[ch - 1, cw - 1]], np.int32), (K, 1))
    pos = jnp.asarray(np.array([ch // 2, cw // 2], np.int32))
    f = np.uint8(128)

    yy, xx = np.mgrid[:ch, :cw]

    def sym_blob(ci, cj, sig, amp):
        b = np.exp(-((yy - ci) ** 2 + (xx - cj) ** 2) / (2.0 * sig**2))
        return np.clip(128 - amp * b, 0, 255).astype(np.uint8)

    cases = []
    for _ in range(8):
        kind = rng.integers(0, 4)
        if kind == 0:  # flat field (whole-window tie)
            fr = np.full((ch, cw), int(rng.integers(0, 256)), np.uint8)
        elif kind == 1:  # centered symmetric blob (mirror ties)
            fr = sym_blob(ch // 2, cw // 2, float(rng.uniform(1.5, 6)),
                          float(rng.uniform(40, 120)))
        elif kind == 2:  # square plateau (block of equal maxima)
            fr = np.full((ch, cw), 128, np.uint8)
            s = int(rng.integers(2, 8))
            i0, j0 = int(rng.integers(5, ch - 10)), int(rng.integers(5, cw - 10))
            fr[i0:i0 + s, j0:j0 + s] = 20
        else:  # mirror-duplicated noise (two exactly equal peaks)
            half = rng.integers(0, 256, size=(ch, cw // 2 + 1)).astype(np.uint8)
            fr = np.concatenate([half[:, :-1], half[:, ::-1][:, :cw - cw // 2]],
                                axis=1)[:, :cw]
        cases.append(np.ascontiguousarray(fr))

    for fr in cases:
        crops = np.broadcast_to(fr, (K, ch, cw)).copy()
        out_x = np.asarray(fns.scan_bounded(jnp.asarray(crops), pos, f,
                                            deltas, lo, hi))
        out_p = np.asarray(pal(jnp.asarray(crops), pos, f, deltas, lo, hi))
        np.testing.assert_array_equal(out_p, out_x)
