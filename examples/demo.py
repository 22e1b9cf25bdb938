"""Runnable end-to-end demo: synthesize a clip, track it, write a diagnostic
overlay, and report accuracy.

    python examples/demo.py [out_dir]

Produces ``demo.mp4`` (the input), ``diag.mp4`` (the 640x360 overlay with the
tracked trail), and prints per-frame RMSE vs the known ground truth.
"""

import math
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(out_dir: str = "."):
    from pawsometracker_tpu import IJ, track

    h, w, fps, seconds = 480, 640, 24, 8
    n = fps * seconds
    truth = []
    path = os.path.join(out_dir, "demo.mp4")

    # a dark "animal" wandering on a Lissajous curve over a textured background
    rng = np.random.default_rng(0)
    texture = rng.integers(110, 150, size=(h, w)).astype(np.uint8)
    try:
        from pawsometracker_tpu.io.native_io import NativeVideoWriter

        writer = NativeVideoWriter(path, w, h, fps)
    except Exception:
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h), isColor=False)
    for t in range(n):
        ph = 2 * math.pi * t / n
        ij = (int(240 + 150 * math.sin(2 * ph)), int(320 + 250 * math.sin(3 * ph + 0.7)))
        truth.append(ij)
        f = texture.copy()
        cv2.circle(f, (ij[1], ij[0]), 9, 25, -1)
        writer.write(f)
    writer.release()

    # the target moves up to ~25 px/frame, so the search window must be wider
    # than the default (window_size relates to inter-frame motion — same
    # guidance as the reference's docstring)
    ts, ij = track(
        path,
        fps=fps,
        start_location=IJ(*truth[0]),
        target_width=18,
        window_size=61,
        diagnostic_file=os.path.join(out_dir, "diag.mp4"),
        subpixel=True,
    )
    err = np.linalg.norm(np.asarray(ij) - np.asarray(truth[: len(ij)]), axis=1)
    print(f"tracked {len(ij)} frames; RMSE {np.sqrt(np.mean(err**2)):.3f} px; "
          f"max error {err.max():.3f} px")
    print(f"wrote {path} and {os.path.join(out_dir, 'diag.mp4')}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
