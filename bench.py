"""Benchmark: tracked frames/sec/chip at 1080p (BASELINE.md headline metric).

Runs on the real TPU. Pipeline measured end-to-end: host (native libav) decode
-> chunked uint8 transfer -> jitted device scan -> positions, on a synthetic
1080p clip with a moving target. Also reports the device-only scan throughput
(decode excluded) for both the pure-XLA path and the fused Pallas kernel, and
a single-threaded CPU proxy of the reference's hot loop (windowed DoG FIR via
scipy, mirroring src/PawsomeTracker.jl:55-62) as the baseline denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
"""

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

H, W = 1080, 1920
FPS = 24.0
N_FRAMES = 480  # 20 s clip
TARGET_WIDTH = 25
WINDOW = 41
CHUNK = 64


def synthesize_clip(path: str, n: int = N_FRAMES) -> list:
    """Encode a 1080p H.264 clip with a dark target moving on a circle
    (falls back to cv2 mp4v if the native x264 encoder is unavailable)."""
    import cv2

    try:
        from pawsometracker_tpu.io.native_io import NativeVideoWriter, native_available

        vw = NativeVideoWriter(path, W, H, FPS) if native_available() else None
    except Exception:
        vw = None
    if vw is None:
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (W, H), isColor=False)
        assert vw.isOpened()
    truth = []
    base = np.full((H, W), 128, np.uint8)
    for t in range(n):
        ang = 2 * np.pi * t / n
        ij = (int(540 + 300 * np.sin(ang)), int(960 + 600 * np.cos(ang)))
        truth.append(ij)
        f = base.copy()
        cv2.circle(f, (ij[1], ij[0]), 12, 30, -1)
        vw.write(f)
    vw.release()
    return truth


def bench_end_to_end(path, truth, reps: int = 2):
    """Best-of-reps end-to-end throughput (the shared TPU tunnel in this
    environment has high run-to-run variance; best-of is the stable statistic)."""
    from pawsometracker_tpu import IJ, track

    # warm-up: compile the scan for this spec + chunk shape on a short window
    track(path, stop=2 * CHUNK / FPS, start_location=IJ(*truth[0]),
          target_width=TARGET_WIDTH, window_size=WINDOW, chunk_size=CHUNK)
    best = 0.0
    rmse, n = None, 0
    for _ in range(reps):
        t0 = time.perf_counter()
        ts, ij = track(path, start_location=IJ(*truth[0]), target_width=TARGET_WIDTH,
                       window_size=WINDOW, chunk_size=CHUNK)
        dt = time.perf_counter() - t0
        err = np.linalg.norm(np.asarray(ij) - np.asarray(truth[: len(ij)]), axis=1)
        rmse = float(np.sqrt(np.mean(err**2)))
        n = len(ij)
        best = max(best, n / dt)
    return best, rmse, n


def bench_device_scan(frames, pos0):
    """Device-only scan throughput (frames already in host RAM, includes H2D)."""
    import jax.numpy as jnp

    from pawsometracker_tpu.models.dog_tracker import make_spec, tracker_fns

    spec = make_spec((H, W), WINDOW, TARGET_WIDTH, True)
    fns = tracker_fns(spec)
    fill = np.uint8(128)
    p = jnp.asarray(np.asarray(pos0, np.int32))
    chunks = [frames[i : i + CHUNK] for i in range(0, len(frames), CHUNK)]
    chunks = [c for c in chunks if c.shape[0] == CHUNK]
    out = fns.scan(jnp.asarray(chunks[0]), p, fill)
    out.block_until_ready()  # compile
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for c in chunks:
            out = fns.scan(jnp.asarray(c), p, fill)
        out.block_until_ready()
        best = max(best, len(chunks) * CHUNK / (time.perf_counter() - t0))
    return best


def bench_pallas_scan(frames, pos0):
    import jax
    import jax.numpy as jnp

    from pawsometracker_tpu.models.dog_tracker import make_spec
    from pawsometracker_tpu.ops.pallas_tracker import pallas_scan_fn

    if jax.default_backend() != "tpu":
        return None
    spec = make_spec((H, W), WINDOW, TARGET_WIDTH, True)
    fn = pallas_scan_fn(spec)
    fill = np.uint8(128)
    p = jnp.asarray(np.asarray(pos0, np.int32))
    chunks = [frames[i : i + CHUNK] for i in range(0, len(frames), CHUNK)]
    chunks = [c for c in chunks if c.shape[0] == CHUNK]
    out = fn(jnp.asarray(chunks[0]), p, fill)
    out.block_until_ready()
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for c in chunks:
            out = fn(jnp.asarray(c), p, fill)
        out.block_until_ready()
        best = max(best, len(chunks) * CHUNK / (time.perf_counter() - t0))
    return best


def bench_cpu_reference_proxy(frames, pos0):
    """Single-threaded CPU implementation of the reference hot loop
    (windowed DoG FIR + argmax, reference: src/PawsomeTracker.jl:55-62)."""
    import scipy.ndimage as ndi

    from pawsometracker_tpu.ops.dog_kernel import dog_kernel_2d, get_sigma

    k, L = dog_kernel_2d(get_sigma(TARGET_WIDTH), True)
    k = k.astype(np.float64)
    r = WINDOW // 2
    half = L // 2
    pos = tuple(pos0)
    t0 = time.perf_counter()
    n = min(len(frames), 96)
    for f in frames[:n]:
        pad = np.pad(
            f.astype(np.float64),
            ((r + half, r + half), (r + half, r + half)),
            constant_values=128.0,
        )
        patch = pad[pos[0] : pos[0] + 2 * r + L, pos[1] : pos[1] + 2 * r + L]
        resp = -ndi.correlate(patch, k, mode="constant")[half:-half, half:-half]
        idx = np.unravel_index(np.argmax(resp.T), resp.T.shape)
        pos = (
            min(max(pos[0] - r + idx[1], 0), H - 1),
            min(max(pos[1] - r + idx[0], 0), W - 1),
        )
    dt = time.perf_counter() - t0
    return n / dt


def main():
    import jax

    detail = {"backend": jax.default_backend(), "resolution": f"{W}x{H}"}

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bench1080.mp4")
        truth = synthesize_clip(path)

        fps_e2e, rmse, n = bench_end_to_end(path, truth)
        detail["rmse_px"] = round(rmse, 3)
        detail["frames"] = n

        # pre-decode for device-only + CPU-proxy benches
        from pawsometracker_tpu.io.decode import open_source

        t0 = time.perf_counter()
        with open_source(path, fps=FPS) as src:
            frames = src.read_chunk(N_FRAMES)
        detail["decode_fps"] = round(frames.shape[0] / (time.perf_counter() - t0), 1)

        fps_device = bench_device_scan(frames, truth[0])
        detail["device_scan_fps"] = round(fps_device, 1)
        try:
            fps_pallas = bench_pallas_scan(frames, truth[0])
            if fps_pallas:
                detail["pallas_scan_fps"] = round(fps_pallas, 1)
        except Exception as e:  # keep the bench robust to kernel regressions
            detail["pallas_error"] = str(e)[:120]

        fps_cpu = bench_cpu_reference_proxy(frames, truth[0])
        detail["cpu_reference_proxy_fps"] = round(fps_cpu, 1)

    result = {
        "metric": "tracked frames/sec/chip, end-to-end 1080p (decode+track)",
        "value": round(fps_e2e, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps_e2e / fps_cpu, 2),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
