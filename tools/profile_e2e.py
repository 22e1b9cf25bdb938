#!/usr/bin/env python
"""One-off e2e pipeline profile on the bench clip (dev tool).

Runs the exact bench e2e workload (warm), then PROF_REPS measured passes,
printing for each pass:

- wall, fps, rmse
- main-thread sections (crop = decode+crop acquire, drain = result joins)
- worker-side channel ops (stage_h2d = ``jnp.asarray`` per chunk, enqueue =
  jitted scan dispatch, split chain/super so group dispatch activity is
  visible)
- controller convergence: final auto depth, final group target, replays,
  and the per-drain block-time histogram that drives auto-deepening

Use alongside the bench ``hostceil`` stage to see where the gap between e2e
and the no-device decode ceiling sits in the current tunnel phase.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # noqa: E402  (repo-root bench machinery)


def main() -> None:
    reps = int(os.environ.get("PROF_REPS", "3"))

    import jax.numpy as jnp

    from pawsometracker_tpu import IJ, track
    from pawsometracker_tpu import pipeline as pl
    from pawsometracker_tpu.utils.profiling import Timer

    timers: list = []
    pipes: list = []
    samples = defaultdict(list)
    drain_blocks: list = []

    class _SpyTimer(Timer):
        def __init__(self):
            super().__init__()
            timers.append(self)

    import pawsometracker_tpu.api as api

    api.Timer = _SpyTimer

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            r = fn(*a, **k)
            samples[name].append(time.perf_counter() - t0)
            return r
        return wrap

    orig_submit_stage = pl._SerialDispatcher.submit_stage

    def submit_stage(self, fn, *args):
        if fn is jnp.asarray:
            fn = timed("stage_h2d", fn)
        return orig_submit_stage(self, fn, *args)

    pl._SerialDispatcher.submit_stage = submit_stage
    for m in ("_run_first", "_run_chain", "_run_super"):
        setattr(pl._SingleEngine, m, timed(m, getattr(pl._SingleEngine, m)))
    pl._SingleEngine.to_host = timed("to_host", pl._SingleEngine.to_host)

    orig_run = pl.SpeculativePipeline.run
    orig_drain = pl.SpeculativePipeline._drain_one

    def run(self, *a, **k):
        pipes.append(self)
        return orig_run(self, *a, **k)

    def drain_one(self):
        t0 = time.perf_counter()
        r = orig_drain(self)
        drain_blocks.append(time.perf_counter() - t0)
        return r

    pl.SpeculativePipeline.run = run
    pl.SpeculativePipeline._drain_one = drain_one
    pl.SpeculativePipeline._replay = timed("replay", pl.SpeculativePipeline._replay)
    pl._GroupDispatchBase.ready = timed("ready_chk", pl._GroupDispatchBase.ready)
    pl.SpeculativePipeline._aim = timed("aim", pl.SpeculativePipeline._aim)
    pl.SpeculativePipeline._accept = timed("accept", pl.SpeculativePipeline._accept)
    pl._SingleEngine.dispatch = timed("disp_sub", pl._SingleEngine.dispatch)

    with tempfile.TemporaryDirectory() as d:
        bench.synthesize_clip(d)
        path, truth = bench._clip(d)
        p0 = IJ(int(truth[0][0]), int(truth[0][1]))
        kw = dict(start_location=p0, target_width=bench.TARGET_WIDTH,
                  window_size=bench.WINDOW)
        track(path, **kw)  # warm: compiles every shape the run uses
        for rep in range(reps):
            timers.clear()
            pipes.clear()
            samples.clear()
            drain_blocks.clear()
            r0 = pl.replay_count
            t0 = time.perf_counter()
            ts, ij = track(path, **kw)
            wall = time.perf_counter() - t0
            err = np.linalg.norm(np.asarray(ij) - truth[: len(ij)], axis=1)
            sec = ({k: round(v, 3) for k, v in timers[-1].totals.items()}
                   if timers else {})
            p = pipes[-1] if pipes else None
            print(f"rep {rep}: wall {wall:6.3f}s fps {len(ij)/wall:7.1f} "
                  f"rmse {float(np.sqrt(np.mean(err**2))):.3f} "
                  f"depth {getattr(p, 'depth_cur', '?')}/"
                  f"{getattr(p, 'depth_max', '?')} "
                  f"group {getattr(getattr(p, 'engine', None), 'group_target', '?')} "
                  f"replays {pl.replay_count - r0}")
            print(f"   main sections {sec}")
            for name, vals in sorted(samples.items()):
                v = np.asarray(vals)
                print(f"   {name:12s} n={len(v):3d} total={v.sum():6.3f}s "
                      f"med={np.median(v)*1e3:6.2f}ms max={v.max()*1e3:7.2f}ms")
            if drain_blocks:
                v = np.asarray(drain_blocks)
                top = ", ".join(f"{x*1e3:.1f}" for x in sorted(v)[-6:])
                print(f"   drain_one    n={len(v):3d} total={v.sum():6.3f}s "
                      f"med={np.median(v)*1e3:6.2f}ms "
                      f">2ms: {(v > 0.002).sum()}  top(ms): {top}")


if __name__ == "__main__":
    main()
