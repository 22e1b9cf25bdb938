"""Interleaved same-process A/B for tunnel-phase-robust comparisons.

`tpu_compare.py` runs each configuration in its own subprocess — robust to
wedges, but tunnel phase drifts BETWEEN configs (the dev tunnel varies ~15x
on minute timescales), so consecutive configs are not comparable. This tool
alternates two configurations rep-by-rep in ONE process (A B A B ...), so
each pair shares a phase window and the jitted programs are compiled once.

Usage:
    python tools/tpu_interleave.py dispatch [pairs]   # async vs sync dispatch
    python tools/tpu_interleave.py group [pairs]      # group=1 vs group=4 @ depth 7
    python tools/tpu_interleave.py depth [pairs]      # auto depth vs depth=1
    python tools/tpu_interleave.py autod3 [pairs]     # shipped auto vs fixed depth 3

Every mode sets BOTH arms' env explicitly (ambient PAWS_* pins from a prior
shell experiment would otherwise leak into "default" arms and mistune the
comparison).

Prints one JSON line with per-rep fps for both arms and the paired ratios.
"""

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODES = {
    # label: (env_a, kw_a, env_b, kw_b)
    "dispatch": (
        {"PAWS_SYNC_DISPATCH": "0", "PAWS_DISPATCH_GROUP": "1"},
        {},
        {"PAWS_SYNC_DISPATCH": "1", "PAWS_DISPATCH_GROUP": "1"},
        {},
    ),
    "group": (
        {"PAWS_DISPATCH_GROUP": "1", "PAWS_SYNC_DISPATCH": "0"},
        {"pipeline_depth": 7},
        {"PAWS_DISPATCH_GROUP": "4", "PAWS_SYNC_DISPATCH": "0"},
        {"pipeline_depth": 7},
    ),
    "depth": (
        {"PAWS_DISPATCH_GROUP": "1", "PAWS_SYNC_DISPATCH": "0"},
        {},
        {"PAWS_DISPATCH_GROUP": "1", "PAWS_SYNC_DISPATCH": "0"},
        {"pipeline_depth": 1},
    ),
    # parallel H2D staging pool (shipped default) vs staging on the FIFO worker
    "stage": (
        {"PAWS_STAGE_THREADS": "2", "PAWS_DISPATCH_GROUP": "", "PAWS_SYNC_DISPATCH": "0"},
        {},
        {"PAWS_STAGE_THREADS": "0", "PAWS_DISPATCH_GROUP": "", "PAWS_SYNC_DISPATCH": "0"},
        {},
    ),
    # eager opportunistic drain (shipped default) vs lazy depth-lagged drain
    "eager": (
        {"PAWS_EAGER_DRAIN": "1", "PAWS_DISPATCH_GROUP": "", "PAWS_SYNC_DISPATCH": "0"},
        {},
        {"PAWS_EAGER_DRAIN": "0", "PAWS_DISPATCH_GROUP": "", "PAWS_SYNC_DISPATCH": "0"},
        {},
    ),
    # the shipped auto controller vs the best fixed point from the round-2
    # K/depth sweep — auto must match it or the default is mistuned
    "autod3": (
        {"PAWS_DISPATCH_GROUP": "", "PAWS_SYNC_DISPATCH": "0"},
        {},
        {"PAWS_DISPATCH_GROUP": "", "PAWS_SYNC_DISPATCH": "0"},
        {"pipeline_depth": 3, "roi_frames": 8, "speculate": "predict"},
    ),
    # spec decode vs the fast_decode loop-filter skip — decode is the
    # binding roofline, so B should win by the hostceil delta. The A arm
    # pins fast_decode=False explicitly (an ambient PAWSIO_FAST_DECODE=1
    # would otherwise make both arms fast and flatten the ratio)
    "fastdec": (
        {"PAWS_DISPATCH_GROUP": "", "PAWS_SYNC_DISPATCH": "0"},
        {"fast_decode": False},
        {"PAWS_DISPATCH_GROUP": "", "PAWS_SYNC_DISPATCH": "0"},
        {"fast_decode": True},
    ),
}


def main():
    import numpy as np

    mode = sys.argv[1] if len(sys.argv) > 1 else "dispatch"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    clip_dir = sys.argv[3] if len(sys.argv) > 3 else None
    env_a, kw_a, env_b, kw_b = MODES[mode]

    import bench

    from pawsometracker_tpu import IJ, track

    tmp = None
    if clip_dir is None:
        tmp = tempfile.mkdtemp()
        clip_dir = tmp
        try:
            bench.synthesize_clip(clip_dir)
        except BaseException:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
            raise
    path = os.path.join(clip_dir, "bench1080.mp4")
    truth = np.load(os.path.join(clip_dir, "truth.npy"))
    p0 = IJ(int(truth[0][0]), int(truth[0][1]))
    kw = dict(start_location=p0, target_width=25, window_size=41)

    def run(env, extra):
        # shipped defaults first, then the arm's overrides — an ambient
        # PAWS_* pin from a prior shell experiment must not leak into arms
        # that don't mention the knob
        for k, v in {"PAWS_EAGER_DRAIN": "1", "PAWS_STAGE_THREADS": "2"}.items():
            os.environ[k] = v
        for k, v in env.items():
            os.environ[k] = v
        t0 = time.perf_counter()
        ts, ij = track(path, **kw, **extra)
        dt = time.perf_counter() - t0
        err = np.linalg.norm(np.asarray(ij) - truth[: len(ij)], axis=1)
        return len(ij) / dt, float(np.sqrt(np.mean(err**2)))

    import statistics

    try:
        # warm both arms (compiles + engine-decision cache) before measuring
        t0 = time.perf_counter()
        run(env_a, kw_a)
        run(env_b, kw_b)
        warm_s = time.perf_counter() - t0

        a_fps, b_fps, rmses = [], [], []
        for _ in range(pairs):
            fa, ra = run(env_a, kw_a)
            fb, rb = run(env_b, kw_b)
            a_fps.append(round(fa, 1))
            b_fps.append(round(fb, 1))
            rmses.extend([ra, rb])
        ratios = [round(b / a, 3) for a, b in zip(a_fps, b_fps)]
        out = {
            "mode": mode,
            "warm_s": round(warm_s, 1),
            "a": {"env": env_a, "kw": kw_a, "fps": a_fps},
            "b": {"env": env_b, "kw": kw_b, "fps": b_fps},
            "b_over_a": ratios,
            "median_ratio": round(statistics.median(ratios), 3),
            "rmse_max": round(max(rmses), 3),
        }
        print(json.dumps(out))
    finally:
        if tmp is not None:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
