"""Behavioral thread-safety: concurrent track() calls from multiple threads
(the analog of the reference's multi-thread CI matrix, SURVEY.md §4/§5 —
thread-safety asserted behaviorally, not with sanitizers)."""

import concurrent.futures as cf

import numpy as np

from pawsometracker_tpu import IJ, track

import helpers


def test_concurrent_tracks_from_threads(tmp_path):
    rng = np.random.default_rng(71)
    files, truths = [], []
    for b in range(3):
        _, tra = helpers.build_trajectory(25, 24, (50, 50), rng)
        f = helpers.trajectory2video(tra[:48], str(tmp_path), 24, 100, 100, 10, True)
        import os

        f2 = str(tmp_path / f"t{b}.avi")
        os.rename(f, f2)
        files.append(f2)
        truths.append(tra[:48])

    def work(i):
        return track(files[i], fps=24, start_location=IJ(50, 50), target_width=10)

    with cf.ThreadPoolExecutor(max_workers=3) as ex:
        results = list(ex.map(work, range(3)))

    for (ts, ij), tra in zip(results, truths):
        assert len(ij) == len(tra)
        rmse = np.sqrt(np.mean(np.sum((np.asarray(ij) - np.asarray(tra)) ** 2, axis=1)))
        assert rmse < 1.0


def test_repeated_tracks_same_process(tmp_path):
    """jit/function caches stay consistent across many calls with mixed specs."""
    rng = np.random.default_rng(72)
    _, tra = helpers.build_trajectory(25, 24, (50, 50), rng)
    f = helpers.trajectory2video(tra[:30], str(tmp_path), 24, 100, 100, 10, True)
    outs = []
    for ws in (15, 21, 15, 21):
        _, ij = track(f, fps=24, start_location=IJ(50, 50), target_width=10, window_size=ws)
        outs.append(ij)
    np.testing.assert_array_equal(outs[0], outs[2])
    np.testing.assert_array_equal(outs[1], outs[3])
