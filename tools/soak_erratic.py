#!/usr/bin/env python
"""Erratic-motion hardware soak for the speculative pipeline controller.

Synthesizes a long clip whose target alternates smooth arcs, direction
reversals, speed bursts and dead stops (every regime the aim predictor can
get wrong, while staying within the per-frame window-drift bound so the
tracker itself never loses it), tracks it end-to-end on the attached
device, and asserts the <1 px oracle. Reports fps, replay count, and the
converged depth/group — the regression canary for depth-controller changes
(round 4: error-gated soft cap, evidence ramp, secant-lag aim).

Usage: python tools/soak_erratic.py [n_frames]
"""

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def synth(path, n, h=720, w=1280, r=10):
    import cv2

    rng = np.random.default_rng(42)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (w, h),
                         isColor=False)
    ij = np.array([h / 2, w / 2])
    vel = np.array([3.0, 5.0])
    truth = []
    for t in range(n):
        if t % 120 == 0:  # regime change: new speed/direction
            ang = rng.uniform(0, 2 * np.pi)
            speed = rng.choice([0.0, 2.0, 6.0, 11.0])  # stop..burst
            vel = speed * np.array([np.sin(ang), np.cos(ang)])
        if t % 37 == 0:  # hard reversal mid-regime
            vel = -vel
        vel += rng.normal(0, 0.6, 2)  # jitter
        vel = np.clip(vel, -12, 12)  # inside the window drift bound
        ij = ij + vel
        # bounce off edges
        for a, lim in ((0, h), (1, w)):
            if ij[a] < 30 or ij[a] > lim - 30:
                vel[a] = -vel[a]
                ij[a] = np.clip(ij[a], 30, lim - 30)
        p = np.round(ij).astype(int)
        truth.append(tuple(p))
        f = np.full((h, w), 128, np.uint8)
        import cv2

        cv2.circle(f, (p[1], p[0]), r, 30, -1)
        vw.write(f)
    vw.release()
    return np.asarray(truth)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    from pawsometracker_tpu import IJ, track
    from pawsometracker_tpu import pipeline as pl

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "soak.mp4")
        truth = synth(path, n)
        kw = dict(start_location=IJ(*truth[0]), target_width=20,
                  window_size=31)
        track(path, stop=64 / 24.0, **kw)  # warm compiles
        r0 = pl.replay_count
        t0 = time.perf_counter()
        ts, ij = track(path, **kw)
        dt = time.perf_counter() - t0
        err = np.linalg.norm(np.asarray(ij) - truth[: len(ij)], axis=1)
        rmse = float(np.sqrt(np.mean(err**2)))
        print(
            f"frames {len(ij)}/{n}  fps {len(ij)/dt:.1f}  rmse {rmse:.3f}  "
            f"max_err {float(err.max()):.1f}  replays {pl.replay_count - r0}"
        )
        assert len(ij) == n, (len(ij), n)
        assert rmse < 1.0, rmse
        print("SOAK PASS")


if __name__ == "__main__":
    main()
