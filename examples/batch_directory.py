"""Production-style worked example: track every video in a directory.

    python examples/batch_directory.py <dir> [--demo] [--resume] [--out results]

- ``--demo`` synthesizes three short clips into <dir> first (so the example is
  runnable anywhere).
- Short clips are tracked together with ``track_batch`` (one device dispatch
  drives all of them; under a ``jax.sharding.Mesh`` the batch axis shards
  across chips — see docs/deployment.md).
- Long clips (>= LONG_SECONDS) go through ``track_resumable`` with a per-video
  checkpoint next to the output: interrupt the process at any point and rerun
  with ``--resume`` — finished slices are never recomputed and the resumed
  trajectory is bit-identical to an uninterrupted run (checkpoint.py).
- Results land as one ``.npz`` per video (timestamps + positions) plus a
  combined ``summary.csv``.

This is the batch/serving analog of the reference's one-file-at-a-time loop
(reference: src/PawsomeTracker.jl:109-146, 176-214).
"""

import argparse
import csv
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

VIDEO_EXTS = (".mp4", ".avi", ".mkv", ".mov")
LONG_SECONDS = 120.0  # checkpointed path for anything at least this long


def synthesize_demo_clips(d: str):
    import cv2

    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(7)
    for i in range(3):
        h, w, fps, n = 240, 320, 24, 96
        path = os.path.join(d, f"demo{i}.mp4")
        vw = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h), isColor=False
        )
        ij = np.array([120.0, 80.0 + 40 * i])
        for t in range(n):
            ij = np.clip(
                ij + rng.normal(0, 2.0, 2) + [0.3, 1.2], [20, 20], [h - 20, w - 20]
            )
            f = np.full((h, w), 128, np.uint8)
            cv2.circle(f, (int(ij[1]), int(ij[0])), 6, 0, -1)
            vw.write(f)
        vw.release()
    print(f"synthesized 3 demo clips in {d}")


def video_duration_s(path: str) -> float:
    """Container duration via the library's prober (native layer first,
    cv2 fallback inside)."""
    from pawsometracker_tpu.io.decode import probe

    info = probe(path)
    return info.frame_count / info.fps if info.frame_count > 0 and info.fps > 0 else 0.0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dir")
    ap.add_argument("--demo", action="store_true", help="synthesize demo clips first")
    ap.add_argument("--resume", action="store_true",
                    help="reuse checkpoints from an interrupted run")
    ap.add_argument("--out", default="results", help="output directory")
    args = ap.parse_args()

    from pawsometracker_tpu import track_batch
    from pawsometracker_tpu.checkpoint import track_resumable

    if args.demo:
        synthesize_demo_clips(args.dir)
    os.makedirs(args.out, exist_ok=True)

    videos = sorted(
        os.path.join(args.dir, f)
        for f in os.listdir(args.dir)
        if f.lower().endswith(VIDEO_EXTS)
    )
    if not videos:
        raise SystemExit(f"no videos in {args.dir} (try --demo)")
    short = [v for v in videos if video_duration_s(v) < LONG_SECONDS]
    long_ = [v for v in videos if v not in short]
    print(f"{len(videos)} videos: {len(short)} batched, {len(long_)} checkpointed")

    rows = []

    def save(video, ts, ij):
        stem = os.path.splitext(os.path.basename(video))[0]
        out = os.path.join(args.out, stem + ".npz")
        np.savez(out, ts=ts, ij=ij)
        rows.append((os.path.basename(video), len(ts), out))
        print(f"  {video}: {len(ts)} frames -> {out}")

    # ---- short clips: one batched run, auto-detected start per video -------
    if short:
        done = [0]

        def progress(frames_done, total, _d=done):
            pct = math.floor(100 * frames_done / max(total, 1))
            if pct >= done[0] + 25:
                done[0] = pct
                print(f"  batch: {pct}%")

        for video, (ts, ij) in zip(short, track_batch(short, progress=progress)):
            save(video, ts, ij)

    # ---- long recordings: per-video checkpointed slices ---------------------
    for video in long_:
        ckpt = os.path.join(
            args.out, os.path.splitext(os.path.basename(video))[0] + ".ckpt.npz"
        )
        if not args.resume and os.path.exists(ckpt):
            os.remove(ckpt)
        ts, ij = track_resumable(video, checkpoint_path=ckpt, checkpoint_every=60.0)
        save(video, ts, ij)

    with open(os.path.join(args.out, "summary.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["video", "frames", "npz"])
        w.writerows(rows)
    print(f"summary: {os.path.join(args.out, 'summary.csv')}")


if __name__ == "__main__":
    main()
