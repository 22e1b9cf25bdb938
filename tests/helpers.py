"""Synthetic-video test harness (model: reference test/test-basic-test.jl:13-135).

Ground-truth trajectory -> synthesized video -> track -> RMSE oracle. The
trajectory is a 5-loop Archimedean spiral sampled uniformly in arc length
(scipy root-finding replaces ApproxFun), with per-point Gaussian jitter,
translated to start at ``start_ij``. Videos are rendered as filled circles on a
mid-gray background and encoded with cv2 (FFV1 lossless by default).
"""

from __future__ import annotations

import math
import os

import cv2
import numpy as np
from scipy.optimize import brentq


def arc_length(theta: float, a: float) -> float:
    """Closed-form arc length of the Archimedean spiral r = a*theta."""
    return a / 2.0 * (theta * math.sqrt(1 + theta**2) + math.asinh(theta))


def spiral(r: float, nframes: int, start_ij, rng) -> list[tuple[int, int]]:
    """5-loop Archimedean spiral, arc-length-uniform, jittered, from start_ij."""
    loops = 5
    a = r / (loops * 2 * math.pi)
    theta_max = loops * 2 * math.pi
    total = arc_length(theta_max, a)
    lengths = np.linspace(0.0, total, nframes + 1)[1:]
    thetas = [brentq(lambda th, l=l: arc_length(th, a) - l, 0.0, theta_max + 1e-9) for l in lengths]
    pts = []
    for th in thetas:
        i = a * th * math.sin(th) + rng.standard_normal()
        j = a * th * math.cos(th) + rng.standard_normal()
        pts.append((round(i), round(j)))
    return [(p[0] - pts[0][0] + start_ij[0], p[1] - pts[0][1] + start_ij[1]) for p in pts]


def build_trajectory(r: float, fps: float, start_ij, rng, seconds: float = 10.0):
    ts = np.arange(0.0, seconds + 0.5 / fps, 1.0 / fps)
    return ts, spiral(r, len(ts), start_ij, rng)


def render_frame(h, w, ij, target_width, darker_target) -> np.ndarray:
    """One frame: filled circle of radius target_width//2 on 0.5-gray."""
    img = np.full((h, w), 128, np.uint8)
    color = 0 if darker_target else 255
    cv2.circle(img, (int(ij[1]), int(ij[0])), max(int(target_width) // 2, 1), color, -1)
    return img


def partition(xs, nsegments):
    """Split xs into nsegments consecutive runs (reference my_partition,
    test/test-basic-test.jl:43-49: segment k spans [i1[k], i1[k+1]] inclusive,
    i.e. adjacent segments share a boundary frame)."""
    n = len(xs)
    idx = np.round(np.linspace(1, n, nsegments + 1)).astype(int)
    i1 = idx[:-1]
    i2 = list(idx[1:-1]) + [n]
    return [xs[a - 1 : b] for a, b in zip(i1, i2)]


def write_video(frames, path, fps, codec="FFV1"):
    ext = ".avi" if codec in ("FFV1", "MJPG", "XVID") else ".mp4"
    if not str(path).endswith(ext):
        path = str(path) + ext
    h, w = frames[0].shape
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*codec), fps, (w, h), isColor=False)
    assert vw.isOpened(), f"VideoWriter failed for {path} ({codec})"
    for f in frames:
        vw.write(f)
    vw.release()
    return str(path)


def trajectory2video(tra, path_dir, fps, w, h, target_width, darker_target, aspect=1, nsegments=0, codec="FFV1"):
    """Render + encode the trajectory. With ``aspect != 1`` the frames are
    anamorphically squeezed to width ``w // aspect`` (the encoded file carries
    no SAR flag — cv2 cannot set one — so tests pass ``sar=aspect`` to track()).
    Returns one path or a list of segment paths."""
    frames = [render_frame(h, w, ij, target_width, darker_target) for ij in tra]
    if aspect != 1:
        w2 = int(w // aspect)
        frames = [cv2.resize(f, (w2, h), interpolation=cv2.INTER_AREA) for f in frames]
    if nsegments > 0:
        paths = []
        for k, seg in enumerate(partition(frames, nsegments)):
            paths.append(write_video(seg, os.path.join(path_dir, f"seg{k}"), fps, codec))
        return paths
    return write_video(frames, os.path.join(path_dir, "example"), fps, codec)


def location2ij(start_location, h, w):
    """Ground-truth blob start point for a given start_location kind
    (reference test/test-basic-test.jl:87-89), 0-based."""
    if start_location is None:
        return (h // 2 - 1, w // 2 - 1)
    from pawsometracker_tpu import IJ

    if isinstance(start_location, IJ):
        return (start_location.i, start_location.j)
    x, y = start_location
    return (y, x)


def fix_start_location(start_location, aspect):
    """Convert the test-frame start location to tracker coordinates under the
    anamorphic squeeze (reference test/test-basic-test.jl:91-99)."""
    if start_location is None:
        return None
    from pawsometracker_tpu import IJ

    if isinstance(start_location, IJ):
        return IJ(start_location.i, round(start_location.j / aspect))
    x, y = start_location
    return IJ(y, round(x / aspect))


def scale_back(ij, aspect):
    """Tracked (row, col) -> test-frame coordinates (reference :101-104)."""
    return (ij[0], round(aspect * ij[1]))


def compare(
    tmp_path,
    fps=24,
    start_location=None,
    w=100,
    h=100,
    target_width=10,
    darker_target=True,
    aspect=1,
    diagnostic_file=None,
    nsegments=0,
    seed=0,
    codec="FFV1",
    **track_kwargs,
):
    """End-to-end oracle: synthesize, track, return RMSE vs ground truth
    (reference test/test-basic-test.jl:106-134). Acceptance: RMSE < 1 px."""
    from pawsometracker_tpu import track

    rng = np.random.default_rng(seed)
    start_ij = location2ij(start_location, h, w)
    r = min(start_ij[0], start_ij[1], h - start_ij[0], w - start_ij[1])
    ts1, tra = build_trajectory(0.8 * r, fps, start_ij, rng)
    files = trajectory2video(
        tra, str(tmp_path), fps, w, h, target_width, darker_target, aspect, nsegments, codec
    )
    sar = aspect if aspect != 1 else None
    if nsegments > 0:
        sl = [None] * len(files)
        sl[0] = fix_start_location(start_location, aspect)
        ts2, tracked = track(
            files,
            fps=fps,
            start_location=sl,
            darker_target=darker_target,
            diagnostic_file=diagnostic_file,
            sar=sar,
            **track_kwargs,
        )
        tra = [ij for seg in partition(tra, nsegments) for ij in seg]
    else:
        ts2, tracked = track(
            files,
            fps=fps,
            start_location=fix_start_location(start_location, aspect),
            darker_target=darker_target,
            diagnostic_file=diagnostic_file,
            sar=sar,
            **track_kwargs,
        )
    m = min(len(tra), len(tracked))
    diffs = [
        np.subtract(o, scale_back(t, aspect)) for o, t in zip(tra[:m], tracked[:m])
    ]
    return float(np.sqrt(np.mean([d @ d for d in diffs])))
