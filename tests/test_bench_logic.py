"""Unit tests for bench.py's pure headline-audit helpers (the number of
record must be robust to tunnel phase and auditable — VERDICT round 2 #2)."""

import sys

import pytest


@pytest.fixture(scope="module")
def bench():
    import importlib
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return importlib.import_module("bench")


def test_degraded_detection(bench):
    assert bench._e2e_is_degraded({"e2e_error": "timeout"})
    assert bench._e2e_is_degraded({"e2e_degraded": "probe 3 fps"})
    # wide intra-stage spread (>2.5x) marks a wedged rep
    assert bench._e2e_is_degraded(
        {"e2e_fps": 300, "e2e_spread": {"med": 300, "min": 100, "max": 320}}
    )
    # a tight spread below the healthy-phase capability is a mid-grade phase
    # (bar tracks the measured healthy band — pin against the live constant
    # so band moves don't silently invalidate this test)
    bar = bench.E2E_HEALTHY_RESULT_FPS
    assert bench._e2e_is_degraded(
        {"e2e_fps": 0.7 * bar,
         "e2e_spread": {"med": 0.7 * bar, "min": 0.68 * bar, "max": 0.8 * bar}}
    )
    assert not bench._e2e_is_degraded(
        {"e2e_fps": 1.05 * bar,
         "e2e_spread": {"med": 1.05 * bar, "min": bar, "max": 1.1 * bar}}
    )
    assert not bench._e2e_is_degraded(
        {"e2e_fps": 1.3 * bar,
         "e2e_spread": {"med": 1.3 * bar, "min": 1.25 * bar, "max": 1.4 * bar}}
    )


def test_rerun_keeps_best_and_audits(bench, monkeypatch):
    good = bench.E2E_HEALTHY_RESULT_FPS * 1.1
    attempts = iter(
        [
            {"e2e_fps": good,
             "e2e_spread": {"med": good, "min": good - 10, "max": good + 10}},
        ]
    )
    monkeypatch.setattr(
        bench, "_run_stage_subprocess", lambda name, d, t: next(attempts)
    )
    first = {"e2e_fps": 40.0, "e2e_spread": {"med": 40, "min": 5, "max": 200},
             "e2e_degraded": "probe 5 fps"}
    best = bench._rerun_e2e_if_degraded(first, "/nonexistent", 1)
    assert best["e2e_fps"] == good
    # every attempt is recorded for audit
    assert [a["e2e_fps"] for a in best["e2e_attempts"]] == [40.0, good]
    assert best["e2e_attempts"][0]["degraded"] == "probe 5 fps"


def test_rerun_noop_when_healthy(bench, monkeypatch):
    monkeypatch.setattr(
        bench, "_run_stage_subprocess",
        lambda *a: pytest.fail("healthy result must not be re-run"),
    )
    h = bench.E2E_HEALTHY_RESULT_FPS * 1.05
    healthy = {"e2e_fps": h, "e2e_spread": {"med": h, "min": h - 10, "max": h + 10}}
    out = bench._rerun_e2e_if_degraded(healthy, "/nonexistent", 1)
    assert out == healthy and "e2e_attempts" not in out


def test_rerun_never_downgrades(bench, monkeypatch):
    # retries landing in WORSE phases must not replace the first number
    monkeypatch.setattr(
        bench, "_run_stage_subprocess",
        lambda name, d, t: {"e2e_fps": 10.0, "e2e_degraded": "probe 2 fps"},
    )
    first = {"e2e_fps": 120.0, "e2e_degraded": "probe 30 fps"}
    best = bench._rerun_e2e_if_degraded(first, "/nonexistent", 1, max_extra=2)
    assert best["e2e_fps"] == 120.0
    assert len(best["e2e_attempts"]) == 3  # exhausted max_extra, all recorded


def test_wait_for_healthy_phase_records_probes(bench, monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    seq = iter([5.0, 12.0, 80.0])
    hist = []
    fps = bench._wait_for_healthy_phase(lambda: next(seq), 40, 60.0, hist)
    assert fps == 80.0
    assert hist == [5.0, 12.0, 80.0]


def test_wait_for_healthy_phase_deadline(bench, monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    t = [0.0]

    def fake_clock():
        t[0] += 30.0
        return t[0]

    monkeypatch.setattr(bench.time, "perf_counter", fake_clock)
    hist = []
    fps = bench._wait_for_healthy_phase(lambda: 3.0, 40, 60.0, hist)
    assert fps == 3.0  # deadline expired in a bad phase: measure anyway
    assert len(hist) >= 1


def test_rerun_stops_when_attempts_reproduce(bench, monkeypatch):
    """An environment whose TRUE steady state is below the capability bar
    must not burn the whole retry budget every run: two clean attempts that
    agree within 15% are the steady state (review finding on the hard-coded
    E2E_HEALTHY_RESULT_FPS)."""
    calls = []

    def fake_run(name, d, t):
        calls.append(name)
        return {"e2e_fps": 252.0, "e2e_spread": {"med": 252, "min": 245, "max": 260}}

    monkeypatch.setattr(bench, "_run_stage_subprocess", fake_run)
    first = {"e2e_fps": 248.0, "e2e_spread": {"med": 248, "min": 240, "max": 255}}
    best = bench._rerun_e2e_if_degraded(first, "/nonexistent", 1, max_extra=3)
    # one re-run proves consistency; the 3rd and 4th attempts never launch
    assert calls == ["e2e"]
    assert best["e2e_fps"] == 252.0
    assert [a["e2e_fps"] for a in best["e2e_attempts"]] == [248.0, 252.0]


def test_attempts_consistency_helper(bench):
    ok = {"e2e_fps": 250.0, "e2e_spread": {"med": 250, "min": 240, "max": 260}}
    # <2 clean attempts: not consistent
    assert not bench._e2e_attempts_consistent([ok])
    assert not bench._e2e_attempts_consistent([ok, {"e2e_error": "timeout"}])
    # wide spread disqualifies an attempt
    wide = {"e2e_fps": 250.0, "e2e_spread": {"med": 250, "min": 100, "max": 300}}
    assert not bench._e2e_attempts_consistent([ok, wide])
    # >15% apart: a phase artifact, keep retrying
    far = {"e2e_fps": 180.0, "e2e_spread": {"med": 180, "min": 175, "max": 186}}
    assert not bench._e2e_attempts_consistent([ok, far])
    # two clean reproducing attempts: stop
    near = {"e2e_fps": 240.0, "e2e_spread": {"med": 240, "min": 232, "max": 249}}
    assert bench._e2e_attempts_consistent([ok, near])
    # consistency looks at the TOP two; a stray wedged attempt doesn't block
    assert bench._e2e_attempts_consistent([far, ok, near])


def test_stage_hostceil_tiny(bench, tmp_path, monkeypatch):
    """The hostceil stage (device engine swapped for a truth-following no-op)
    must run the real track() ROI path end-to-end; pins the _SingleEngine
    seam a rename would silently break. Geometry is shrunk so the ROI path
    engages (crop 151x151 < 176x320 frame): with the full-frame path the
    dummy engine is never constructed and hostceil_dispatches stays 0."""
    import cv2
    import numpy as np

    d = str(tmp_path)
    H, W, N = 176, 320, 30
    monkeypatch.setattr(bench, "REPS", 1)
    monkeypatch.setattr(bench, "TARGET_WIDTH", 10)
    monkeypatch.setattr(bench, "WINDOW", 15)
    vw = cv2.VideoWriter(
        f"{d}/bench1080.mp4", cv2.VideoWriter_fourcc(*"mp4v"), 24, (W, H),
        isColor=False,
    )
    truth = []
    for t in range(N):
        img = np.full((H, W), 128, np.uint8)
        ij = (88 + t // 3, 40 + 3 * t)
        truth.append(ij)
        cv2.circle(img, (ij[1], ij[0]), 5, 30, -1)
        vw.write(img)
    vw.release()
    np.save(f"{d}/truth.npy", np.asarray(truth))

    from pawsometracker_tpu import pipeline

    orig = pipeline._SingleEngine
    try:
        out = bench.stage_hostceil(d)
    finally:
        pipeline._SingleEngine = orig  # the stage mutates module state
    assert out["hostceil_fps"] > 0
    assert set(out["hostceil_spread"]) == {"med", "min", "max"}
    # the seam engaged: the truth engine was dispatched, cleanly (no replays)
    assert out["hostceil_dispatches"] > 0
    assert "hostceil_degraded" not in out
    # frames 2..n ARE truth (dummy engine); only the frame-1 snap can differ
    assert out["hostceil_rmse"] < 0.5


def test_finalize_signals(bench):
    """SIGTERM mid-run must raise _BenchInterrupted (so main() finalizes the
    JSON line) rather than kill the process silently."""
    import os
    import signal

    old_term = signal.getsignal(signal.SIGTERM)
    old_int = signal.getsignal(signal.SIGINT)
    try:
        bench._install_finalize_signals()
        with pytest.raises(bench._BenchInterrupted):
            os.kill(os.getpid(), signal.SIGTERM)
    finally:
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)


def test_stage_runner_does_not_swallow_interrupt(bench, monkeypatch):
    """_BenchInterrupted must pass through the stage runner's broad
    `except Exception` so main() can finalize the JSON line (review
    finding: as an Exception subclass it was converted to a stage error
    and retried, defeating the SIGTERM finalization)."""
    def boom(*a, **k):
        raise bench._BenchInterrupted("signal 15")

    monkeypatch.setattr(bench.subprocess, "run", boom)
    with pytest.raises(bench._BenchInterrupted):
        bench._run_stage_subprocess("e2e", "/tmp", 1)
    assert issubclass(bench._BenchInterrupted, BaseException)
    assert not issubclass(bench._BenchInterrupted, Exception)


def test_finalize_signals_one_shot(bench):
    """Only the first signal raises; follow-up signals (watchdog re-signal
    before SIGKILL) must not interrupt the JSON finalization."""
    import os
    import signal

    old_term = signal.getsignal(signal.SIGTERM)
    old_int = signal.getsignal(signal.SIGINT)
    try:
        bench._install_finalize_signals()
        with pytest.raises(bench._BenchInterrupted):
            os.kill(os.getpid(), signal.SIGTERM)
        os.kill(os.getpid(), signal.SIGTERM)  # ignored: finalization continues
    finally:
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)


def test_rerun_respects_deadline(bench, monkeypatch):
    """A fully wedged tunnel must not burn (1+max_extra) stage timeouts on
    e2e retries: past the wall-clock deadline no further attempt launches."""
    monkeypatch.setattr(
        bench, "_run_stage_subprocess",
        lambda *a: pytest.fail("attempt launched past the deadline"),
    )
    bad = {"e2e_fps": 3.0, "e2e_degraded": "probe 1 fps"}
    out = bench._rerun_e2e_if_degraded(
        bad, "/nonexistent", 1, deadline=bench.time.perf_counter() - 1.0
    )
    assert out["e2e_fps"] == 3.0 and "e2e_attempts" not in out


def test_host_phase_note_only_when_e2e_exceeds_ceiling(bench):
    assert bench._host_phase_note(314.6, 248.4) is not None
    assert bench._host_phase_note(248.4, 314.6) is None
    assert bench._host_phase_note(0.0, 100.0) is None
    assert bench._host_phase_note(100.0, 0.0) is None


def test_roofline_phase_note_names_the_binder(bench):
    note = bench._roofline_phase_note(314.6, "host pipeline no-device ceiling", 248.4)
    assert note is not None and "host pipeline no-device ceiling" in note
    assert bench._roofline_phase_note(200.0, "x", 248.4) is None
    assert bench._roofline_phase_note(0.0, "x", 1.0) is None

def test_finalize_headline_uses_e2e_denominator(bench):
    """vs_baseline divides two END-TO-END rates (e2e_fps / cpu_e2e_fps);
    the filter-only and 1-thread ratios stay reported alongside."""
    detail = {"e2e_fps": 320.0, "cpu_1t_fps": 4.0, "cpu_mt_fps": 28.0,
              "cpu_e2e_fps": 32.0}
    out = bench._finalize(detail)
    assert out["value"] == 320.0
    assert out["vs_baseline"] == 10.0
    d = out["detail"]
    assert d["vs_baseline_e2e"] == 10.0
    assert d["vs_baseline_mt"] == round(320.0 / 28.0, 2)
    assert d["vs_baseline_1t"] == 80.0
    assert "cpu_e2e_source" not in d  # measured, not composed


def test_finalize_composes_missing_cpu_e2e(bench):
    """A missing cpu_e2e stage composes the serialized decode+filter share
    from the measured rates and SAYS SO in the artifact."""
    detail = {"e2e_fps": 300.0, "cpu_1t_fps": 4.0, "cpu_mt_fps": 30.0,
              "decode_fps": 150.0}
    out = bench._finalize(detail)
    composed = 1.0 / (1.0 / 150.0 + 1.0 / 30.0)  # = 25.0
    assert out["vs_baseline"] == round(300.0 / composed, 2)
    assert "composed" in out["detail"]["cpu_e2e_source"]


def test_finalize_missing_cpu_stages_fall_back_honestly(bench):
    """No CPU stages at all: historical medians, flagged — never a silent
    divide-by-1 that would fabricate a ~300x speedup."""
    out = bench._finalize({"e2e_fps": 280.0})
    d = out["detail"]
    assert "baseline_source" in d and "historical" in d["baseline_source"]
    assert d["vs_baseline_mt"] == round(280.0 / 28.4, 2)
    assert out["vs_baseline"] > 0
