"""Golden position-trace fixture: the full tracked trajectory on the standard
synthetic spiral clip (seed 0, FFV1 lossless, 100x100, target_width 10).

FFV1 decode is bit-exact, the spiral generator is seeded, and the tracker is
integer-valued, so this trace is a drift pin for the WHOLE pipeline: kernel
construction, padding, window slicing, column-major argmax tie-break, clamp,
and fps-resampled decode. Any change to any of those fails the fixture test.

Run from the repo root:  python tests/fixtures/gen_trace_fixture.py
"""

import os
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))  # tests/helpers.py
sys.path.insert(0, os.path.join(HERE, "..", ".."))  # repo root

import jax

jax.config.update("jax_platforms", "cpu")

import helpers  # noqa: E402

from pawsometracker_tpu import IJ, track  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    start_ij = (50, 50)
    _, tra = helpers.build_trajectory(0.8 * 50, 24, start_ij, rng)
    with tempfile.TemporaryDirectory() as d:
        f = helpers.trajectory2video(tra, d, 24, 100, 100, 10, True)
        ts, ij = track(f, fps=24, start_location=IJ(50, 50), target_width=10)
    ij = np.asarray(ij, np.int32)
    rmse = float(np.sqrt(np.mean(np.sum((ij - np.asarray(tra[: len(ij)])) ** 2, axis=1))))
    assert rmse < 1.0, rmse
    np.save(os.path.join(HERE, "trace_spiral.npy"), ij)
    print(f"trace: {len(ij)} frames, rmse={rmse:.4f}")


if __name__ == "__main__":
    main()
