"""CLI tests: ``python -m pawsometracker_tpu``."""

import json
import subprocess
import sys

import numpy as np
import pytest

import helpers


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(61)
    _, tra = helpers.build_trajectory(25, 24, (50, 50), rng)
    return helpers.trajectory2video(tra[:48], str(d), 24, 100, 100, 10, True), tra[:48]


def run_cli(*args, timeout=180):
    return subprocess.run(
        [sys.executable, "-m", "pawsometracker_tpu", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root", "PYTHONPATH": "/root/repo"},
    )


def test_cli_csv(clip):
    f, tra = clip
    r = run_cli(f, "--start-ij", "50", "50", "--target-width", "10")
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().splitlines()
    assert lines[0] == "t,row,col"
    assert len(lines) == 49
    t0, i0, j0 = lines[1].split(",")
    assert float(t0) == 0.0
    assert abs(int(i0) - tra[0][0]) <= 1 and abs(int(j0) - tra[0][1]) <= 1


def test_cli_json(clip):
    f, _ = clip
    r = run_cli(f, "--start-ij", "50", "50", "--target-width", "10", "--format", "json")
    assert r.returncode == 0, r.stderr
    data = json.loads(r.stdout)
    assert len(data["ts"]) == len(data["ij"]) == 48


def test_cli_npz_out(clip, tmp_path):
    f, _ = clip
    out = str(tmp_path / "res.npz")
    r = run_cli(f, "--start-ij", "50", "50", "--target-width", "10", "--out", out)
    assert r.returncode == 0, r.stderr
    with np.load(out) as z:
        assert z["ij"].shape == (48, 2)


def test_cli_errors(clip):
    f, _ = clip
    r = run_cli("/nonexistent.mp4")
    assert r.returncode == 1
    assert "error:" in r.stderr
    r = run_cli(f, "--start-ij", "1", "1", "--start-xy", "2", "2")
    assert r.returncode == 2


def test_cli_help():
    r = run_cli("--help")
    assert r.returncode == 0
    assert "--target-width" in r.stdout


# -- in-process invocations (same surface, traced by the coverage runner) ----


def test_cli_main_inprocess(clip, tmp_path, capsys):
    from pawsometracker_tpu.__main__ import main

    f, tra = clip
    assert main([f, "--start-ij", "50", "50", "--target-width", "10"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == "t,row,col" and len(lines) == 49

    assert main([f, "--start-ij", "50", "50", "--target-width", "10", "--format", "json"]) == 0
    data = json.loads(capsys.readouterr().out)
    assert len(data["ts"]) == 48

    out = str(tmp_path / "r.npz")
    assert main([f, "--start-ij", "50", "50", "--target-width", "10", "--out", out]) == 0
    with np.load(out) as z:
        assert z["ij"].shape == (48, 2)

    assert main(["/nonexistent.mp4"]) == 1
    assert main([f, "--start-ij", "1", "1", "--start-xy", "2", "2"]) == 2
    capsys.readouterr()


def test_cli_main_checkpoint_inprocess(clip, tmp_path, capsys):
    from pawsometracker_tpu.__main__ import main

    f, _ = clip
    cp = str(tmp_path / "cp.npz")
    assert main([f, "--start-ij", "50", "50", "--target-width", "10", "--checkpoint", cp]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 49
    # multiple files with --checkpoint is an error
    assert main([f, f, "--checkpoint", cp]) == 2
    capsys.readouterr()


def test_cli_window_size_kinds(clip, capsys):
    """--window-size accepts a square edge or the reference (w, h) as WxH."""
    from pawsometracker_tpu.__main__ import _window_size, main

    assert _window_size("21") == 21
    assert _window_size("61x9") == (61, 9)
    f, _ = clip
    assert main([f, "--start-ij", "50", "50", "--target-width", "10",
                 "--window-size", "31x21"]) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 49


def test_cli_batch_mode(clip, tmp_path, capsys):
    """--batch treats files as independent videos (track_batch) with a
    file-keyed CSV and per-file npz arrays."""
    import numpy as np

    from pawsometracker_tpu.__main__ import main

    f, _ = clip
    assert main([f, f, "--batch", "--start-ij", "50", "50", "--target-width", "10"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == "file,t,row,col"
    assert len(lines) == 1 + 2 * 48  # both videos, 48 frames each
    assert lines[1].startswith(f)

    out = str(tmp_path / "b.npz")
    assert main([f, f, "--batch", "--start-ij", "50", "50", "--target-width", "10",
                 "--out", out]) == 0
    capsys.readouterr()
    with np.load(out) as z:
        assert z["ij_0"].shape == (48, 2) and z["ij_1"].shape == (48, 2)
        np.testing.assert_array_equal(z["ij_0"], z["ij_1"])  # same clip

    # incompatible combinations are argument errors
    assert main([f, "--batch", "--checkpoint", str(tmp_path / "cp.npz")]) == 2
    assert main([f, "--batch", "--n-targets", "2"]) == 2
    capsys.readouterr()


def test_cli_multi_target_mode(clip, capsys):
    """Repeated --start-ij tracks N targets in one video (track_multi),
    long-format CSV t,target,row,col."""
    from pawsometracker_tpu.__main__ import main

    f, _ = clip
    assert main([f, "--start-ij", "50", "50", "--start-ij", "50", "50",
                 "--target-width", "10"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == "t,target,row,col"
    assert len(lines) == 1 + 2 * 48
    # the two identically-seeded targets agree row-for-row
    t0 = [ln for ln in lines[1:] if ln.split(",")[1] == "0"]
    t1 = [ln for ln in lines[1:] if ln.split(",")[1] == "1"]
    assert [ln.split(",")[2:] for ln in t0] == [ln.split(",")[2:] for ln in t1]


def test_cli_unsupported_flag_combos_error(clip, tmp_path, capsys):
    """Flags a mode cannot honor must fail loudly, never be silently dropped
    (review finding: batch/multi dropped --speculate contain; checkpoint
    dropped --diagnostic-file). Multi-target mode FORWARDS
    --diagnostic-file (shared overlay, N trails)."""
    import cv2

    from pawsometracker_tpu.__main__ import main

    f, _ = clip
    multi = [f, "--start-ij", "50", "50", "--start-ij", "60", "60"]
    assert main(multi + ["--speculate", "contain"]) == 2
    assert main([f, f, "--batch", "--speculate", "contain"]) == 2
    assert main([f, "--checkpoint", "/tmp/cp.npz",
                 "--diagnostic-file", "/tmp/x.mp4"]) == 2
    err = capsys.readouterr().err
    assert err.count("error:") == 3
    # multi + --diagnostic-file is supported: overlay video gets written
    diag = str(tmp_path / "multi_diag.mp4")
    assert main(multi + ["--target-width", "10", "--diagnostic-file", diag]) == 0
    capsys.readouterr()
    cap = cv2.VideoCapture(diag)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 47  # frames 2..n
    cap.release()


def test_cli_progress_flag(clip, tmp_path, capsys):
    """--progress streams a \\r counter to stderr in every mode."""
    from pawsometracker_tpu.__main__ import main

    f, _ = clip
    assert main([f, "--start-ij", "50", "50", "--target-width", "10",
                 "--progress"]) == 0
    cap = capsys.readouterr()
    # 48 sampled frames = frame 1 (snap) + 47 tracked; progress covers the 47
    assert "47/47 frames" in cap.err
    assert main([f, f, "--batch", "--start-ij", "50", "50",
                 "--target-width", "10", "--progress"]) == 0
    cap = capsys.readouterr()
    assert "94/94 frames" in cap.err  # 2 videos x 47 tracked, aggregated
    assert main([f, "--start-ij", "50", "50", "--start-ij", "52", "52",
                 "--target-width", "10", "--progress"]) == 0
    cap = capsys.readouterr()
    assert "47/47 frames" in cap.err  # one stream: frames, not frames x N
    capsys.readouterr()


def test_cli_npy_frame_stack_input(clip, tmp_path, capsys):
    # a .npy frame stack tracks bit-equal to the encoded clip it came from
    from pawsometracker_tpu.__main__ import main

    f, tra = clip
    frames = np.stack(
        [helpers.render_frame(100, 100, ij, 10, True) for ij in tra]
    )
    npy = str(tmp_path / "frames.npy")
    np.save(npy, frames)
    base = ["--start-ij", "50", "50", "--target-width", "10", "--format", "json"]
    assert main([f, *base]) == 0
    from_file = json.loads(capsys.readouterr().out)
    assert main([npy, *base]) == 0
    from_npy = json.loads(capsys.readouterr().out)
    assert from_npy["ij"] == from_file["ij"]

    # .npz with a 'frames' key, plus --input-fps resampling runs end to end
    npz = str(tmp_path / "frames.npz")
    np.savez(npz, frames=frames)
    assert main([npz, *base, "--input-fps", "48"]) == 0
    halved = json.loads(capsys.readouterr().out)
    # 48 frames at a 48 fps native rate cover slots 0..24 of the 24 fps output
    # grid (last frame at t=47/48 s -> slot round(23.5) = 24): 25 frames out
    assert len(halved["ij"]) == 25

    # ambiguous .npz (two arrays, none named 'frames') fails loudly
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, a=frames[:2], b=frames[:2])
    assert main([bad, *base]) == 1
    assert "frames" in capsys.readouterr().err
