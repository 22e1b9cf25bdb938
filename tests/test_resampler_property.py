"""Property tests for the fps-resampler state machines.

Both implementations of ffmpeg's ``fps`` filter (round=near) — the Python one
in ``io/decode.py`` and the C++ one in ``io/native/pawsio.cpp`` — are fed
randomized pts streams and checked against a brute-force model of the filter:

    slot(t)   = round_half_away(t * fps)
    frame i   covers output slots [slot_i, slot_{i+1})   (drops when empty)
    last frame covers one slot (EOF flush)
    output bounded by the duration clamp: slot s emitted iff s/fps < duration

(reference decode pipe: src/PawsomeTracker.jl:155 — `-vf fps=F`.)
"""

import math

import numpy as np
import pytest

from pawsometracker_tpu.io.decode import OpenCVFrameSource, fps_slot


def model_fps_filter(stream, fps, duration):
    """Brute-force expected output: ``stream`` is [(frame_id, t), ...] sorted
    by t with t >= 0; returns the emitted frame_id list."""
    slots = [max(fps_slot(t, fps), 0) for _, t in stream]
    out = []
    emit = None
    for i, (fid, _) in enumerate(stream):
        s = slots[i]
        nxt = slots[i + 1] if i + 1 < len(stream) else s + 1
        if emit is None:
            emit = s  # anchor at the first frame's slot
        if nxt <= s:
            continue  # zero slots: dropped (the newer frame takes over)
        for slot in range(max(s, emit), nxt):
            if slot / fps >= duration:
                return out
            out.append(fid)
            emit = slot + 1
    return out


class ScriptedSource(OpenCVFrameSource):
    """OpenCVFrameSource with ``_next_input`` replaced by a scripted pts
    stream — tests the resampler state machine in isolation."""

    def __init__(self, stream, fps, duration):
        # bypass parent __init__ entirely (no file, no cv2 capture)
        self.fps = float(fps)
        self.duration = float(duration)
        self._script = list(stream)
        self._i = 0
        from fractions import Fraction

        self._fps_frac = Fraction(fps).limit_denominator(1001000)
        self._pending = None
        self._emit_slot = 0
        self._flushed = False
        self._prev_gray = None

    def _next_input(self):
        if self._i >= len(self._script):
            return None
        fid, t = self._script[self._i]
        self._i += 1
        frame = np.full((2, 2), fid % 256, np.uint8)
        return frame, t

    def close(self):
        pass


def run_python_resampler(stream, fps, duration):
    src = ScriptedSource(stream, fps, duration)
    out = []
    while True:
        f = src.read()
        if f is None:
            return out
        out.append(int(f[0, 0]))


@pytest.mark.parametrize("seed", range(30))
def test_python_resampler_matches_model(seed):
    rng = np.random.default_rng(seed)
    fps = float(rng.choice([5, 10, 12.5, 24, 30, 48]))
    duration = float(rng.uniform(0.5, 3.0))
    n = int(rng.integers(1, 40))
    # random pts: mixture of regular spacing, jitter, bursts, and gaps
    ts = np.sort(rng.uniform(0, duration, n))
    stream = [(i % 256, float(t)) for i, t in enumerate(ts)]
    got = run_python_resampler(stream, fps, duration)
    want = model_fps_filter(stream, fps, duration)
    assert got == want, (fps, duration, stream)


@pytest.mark.parametrize("seed", range(8))
def test_native_resampler_matches_model(seed, tmp_path):
    """The C++ resampler, driven through a real (lossless) VFR container."""
    from pawsometracker_tpu.io.native_io import (
        NativeFrameSource,
        NativeVFRWriter,
        native_available,
    )

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(100 + seed)
    fps = float(rng.choice([6, 10, 24, 30]))
    duration = 1000.0  # no clamp: exercise pure resampling
    n = int(rng.integers(2, 25))
    # pts on the 1/90000 grid, strictly increasing, spread over ~2 s. The mp4
    # muxer may shift the whole timeline by a few dozen ticks (observed: -48),
    # which is faithful pts-true behavior on the decoder side — so keep every
    # pts at least 0.05 output slots away from a round-half boundary, where a
    # uniform sub-millisecond shift could legally flip the slot assignment.
    cand = np.arange(0, 180000, 8)
    frac = (cand * fps / 90000.0) % 1.0
    cand = cand[(np.abs(frac - 0.5) > 0.05) & ((frac > 0.05) | (cand == 0)) & (frac < 0.95)]
    ticks = np.sort(rng.choice(cand, size=n, replace=False))
    path = str(tmp_path / f"prop{seed}.mp4")
    w = NativeVFRWriter(path, 64, 64)
    for i, tk in enumerate(ticks):
        w.write(np.full((64, 64), (i * 7 + 3) % 256, np.uint8), tk / 90000.0)
    w.release()

    src = NativeFrameSource(path, fps=fps, prefetch=0)
    got = []
    while True:
        f = src.read()
        if f is None:
            break
        got.append(int(np.median(f)))
    src.close()

    from fractions import Fraction

    stream = [((i * 7 + 3) % 256, Fraction(int(tk), 90000)) for i, tk in enumerate(ticks)]
    want = model_fps_filter(stream, Fraction(fps).limit_denominator(1001000), duration)
    assert got == want, (fps, list(ticks))
