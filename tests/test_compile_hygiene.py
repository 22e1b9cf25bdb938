"""Warm-path compile hygiene: repeated public-API calls with identical
geometry must not trigger ANY new XLA compilation.

Round 3 found two instances of the same bug class: ``jit(chained)`` was
rebuilt (and recompiled, ~0.6 s on the TPU tunnel) inside every ``track()``
call, and ``track_batch`` recompiled its batched ``scan_bounded`` +
``chained`` (~3.7 s) per call — fresh ``jax.jit`` wrapper objects around
lru-cached scan factories never hit the previous wrapper's executable cache.
These tests pin the fix (pipeline.make_chained* memoization,
parallel.mesh._cached_vmap_jit, api._full_scan_sub) by counting compiles
with ``jax.monitoring`` on a SECOND, warm call.
"""

import numpy as np
import pytest

import helpers

from jax import monitoring

from pawsometracker_tpu import IJ, track
from pawsometracker_tpu.batch import track_batch
from pawsometracker_tpu.multi import track_multi


class _CompileCounter:
    """Count XLA backend compiles via jax.monitoring duration events
    (``/jax/core/compile/backend_compile_duration``)."""

    def __init__(self):
        self.count = 0
        self.names = []

    def __call__(self, event, duration, **kw):
        if "backend_compile" in event:
            self.count += 1
            self.names.append(kw.get("fun_name", "?"))


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("hygiene")
    rng = np.random.default_rng(3)
    h, w, n = 120, 160, 40
    p = np.array([40.0, 50.0])
    frames = []
    for _ in range(n):
        f = np.full((h, w), 128, np.uint8)
        cv2.circle(f, (int(round(p[1])), int(round(p[0]))), 4, 0, -1)
        frames.append(f)
        p += rng.uniform(0.4, 1.2, 2)
    path = str(d / "clip.avi")
    helpers.write_video(frames, path, fps=24)
    return path, IJ(40, 50)


def _count_compiles(fn):
    counter = _CompileCounter()
    monitoring.register_event_duration_secs_listener(counter)
    try:
        fn()
    finally:
        monitoring.unregister_event_duration_listener(counter)
    return counter


@pytest.mark.parametrize(
    "call",
    [
        # stream="roi" pins the speculative chained-dispatch path (the one
        # that recompiled per call); the small test frame would otherwise
        # take the full-frame path
        pytest.param(
            lambda p, s: track(p, start_location=s, target_width=8, stream="roi"),
            id="track-roi",
        ),
        pytest.param(lambda p, s: track(p, start_location=s, target_width=8), id="track-full"),
        pytest.param(
            lambda p, s: track(p, start_location=s, target_width=8, subpixel=True,
                               stream="roi"),
            id="track-subpixel",
        ),
        pytest.param(
            lambda p, s: track_batch([p, p], start_location=s, target_width=8,
                                     stream="roi"),
            id="track_batch",
        ),
        pytest.param(
            lambda p, s: track_multi(p, [s], target_width=8, stream="roi"),
            id="track_multi",
        ),
    ],
)
def test_warm_call_compiles_nothing(clip, call):
    path, start = clip
    call(path, start)  # cold: compiles are expected here
    counter = _count_compiles(lambda: call(path, start))
    assert counter.count == 0, f"warm call recompiled: {counter.names}"
