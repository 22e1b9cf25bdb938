"""Multi-target tracking: N independent DoG trackers over ONE frame stream.

Extension beyond the reference (which tracks a single target,
src/PawsomeTracker.jl:32-62): the frame is decoded and padded once per step
and the window step is vmapped over targets, so tracking N targets costs one
decode plus N tiny window correlations. Targets share the tracker
configuration (target_width, window_size, polarity).

Limitation (inherent to the matched-filter design): the trackers carry no
identity model — if two targets' search windows overlap on the same blob, both
will lock onto it.
"""

from __future__ import annotations

import logging

import numpy as np

from .api import DEFAULT_MAX_DURATION_SECONDS, _resolve_guess
from .io.decode import ChunkPrefetcher, open_source
from .models.dog_tracker import make_spec, tracker_fns
from .ops.dog_kernel import fix_window_size, guess_window_size
from .ops.filters import mode_u8_host

__all__ = ["track_multi"]

logger = logging.getLogger(__name__)


def track_multi(
    file,
    start_locations=None,
    *,
    n_targets: int | None = None,
    min_distance: int | None = None,
    start: float = 0.0,
    stop: float | None = None,
    target_width: float = 25,
    window_size=None,
    darker_target: bool = True,
    fps: float = 24,
    sar: float | None = None,
    backend: str = "auto",
    chunk_size: int = 16,
    stream: str = "auto",
    roi_frames: int | None = None,
    pipeline_depth: int | str = "auto",
    engine: str = "auto",
    subpixel: bool = False,
    decode_workers: int | None = None,
    fast_decode: bool | None = None,
    diagnostic_file: str | None = None,
    progress=None,
    input_fps: float | None = None,
):
    """Track N targets in one video.

    ``file`` may be an in-memory uint8 frame array ``[T, H, W]`` or
    ``[T, H, W, 3]`` (see :func:`.api.track`); ``input_fps`` states the
    array's native rate (default: already at ``fps``).

    Each entry of ``start_locations`` is an ``IJ`` or display ``(x, y)``.
    Alternatively pass ``start_locations=None`` with ``n_targets=N`` to
    AUTO-DETECT the N strongest DoG-response peaks in frame 1
    (:func:`.parallel.mesh.global_detect_peaks`; ``min_distance`` sets the
    non-maximum-suppression radius, default the search-window extent) —
    targets are then ordered strongest-first. Returns ``(ts, positions)``
    with ``positions int [T, N, 2]`` (float with ``subpixel=True``: integer
    recurrence + parabolic response-peak refinement, exactly like
    :func:`.api.track`). ``engine="auto"`` makes the measured pallas/xla
    choice for the batched bounded ROI scan.

    Large frames stream as N per-target drift-bounded crops through the
    speculative ROI pipeline (see :mod:`.pipeline`) — with the native decoder
    the crops are cut (and mispredict replays recropped) in C++.

    ``diagnostic_file`` writes ONE shared 640x360 overlay video with N
    markers and one 100-point trail per target (the single-target overlay
    semantics of reference src/diagnose.jl:30-38, fanned out; frame 1 sets
    the scale only, frames 2..n are written). With the native decoder the
    overlay resizes zero-copy retained-frame views straight out of the C++
    decode ring, so diagnostics stay on the fast path; without it they read
    full frames through the prefetcher.
    """
    import jax.numpy as jnp

    autodetect = start_locations is None
    if autodetect:
        if not n_targets or int(n_targets) < 1:
            raise ValueError(
                "give start_locations, or n_targets>=1 for multi-target auto-detect"
            )
    else:
        if n_targets is not None or min_distance is not None:
            raise ValueError(
                "n_targets/min_distance configure auto-detection and conflict "
                "with explicit start_locations — pass one or the other"
            )
        if isinstance(start_locations, np.ndarray):
            # a [N, 2] array of (x, y) rows is a natural input; `if not arr`
            # would raise numpy's truth-value ambiguity before any message
            start_locations = [tuple(row) for row in start_locations.tolist()]
        if len(start_locations) == 0:
            raise ValueError("start_locations must name at least one target")
        if any(loc is None for loc in start_locations):
            raise ValueError(
                "every target needs an explicit start location (IJ or (x, y)), "
                "or pass start_locations=None with n_targets=N to auto-detect"
            )
    stop = DEFAULT_MAX_DURATION_SECONDS if stop is None else float(stop)
    from .api import _check_choice

    _check_choice("stream", stream, ("auto", "roi", "full"))
    _check_choice("backend", backend, ("auto", "native", "opencv"))
    _check_choice("engine", engine, ("auto", "pallas", "xla"))
    if window_size is None:
        window_size = guess_window_size(target_width)
    window_size = fix_window_size(window_size)

    t = stop - start
    n = int(np.round(fps * t))
    if n < 1:
        raise ValueError(f"no frames to track in [{start}, {stop}] at fps={fps}")
    ts = np.linspace(start, stop, n)

    from .api import _resolve_roi_frames
    from .pipeline import roi_geometry, run_multi_roi_pipeline
    from .utils.profiling import Timer

    if pipeline_depth == "auto":
        from .pipeline import AUTO_DEPTH_MAX

        depth_gate = AUTO_DEPTH_MAX
    else:
        pipeline_depth = depth_gate = max(0, int(pipeline_depth))
    roi_frames = _resolve_roi_frames(roi_frames, depth_gate, "predict")
    if pipeline_depth == "auto":
        from .api import _auto_ring_gate

        depth_gate = _auto_ring_gate(file, roi_frames, depth_gate)
    # the multi-target native path crops per target via advance/recrop at
    # EVERY depth (contain mode included), so size the ring whenever ROI
    # streaming is possible — with a diagnostic file only if the .so can
    # serve zero-copy retained views (else FanoutSource falls back to the
    # prefetcher and the big ring would be dead memory)
    from .api import _views_available

    ring_ok = stream != "full" and (diagnostic_file is None or _views_available())
    ring = (depth_gate + 2) * roi_frames + 8 if ring_ok else None
    from .diagnose import Diagnose, Dont

    src = open_source(
        file, start=start, stop=stop, fps=fps, backend=backend, prefetch=ring,
        workers=decode_workers, input_fps=input_fps, fast_decode=fast_decode,
    )
    prefetchers = []  # joined in finally BEFORE src.close()
    dia = None  # created INSIDE the try so the encoder can't leak if
    # open_source (above) or the writer constructor raises; closed last in
    # finally — the ordering the reference's diagnose context manager
    # guarantees (src/diagnose.jl:48-55)
    try:
        # one shared overlay video, N markers/trails per frame (single-target
        # semantics per reference src/diagnose.jl:30-38)
        dia = Dont() if diagnostic_file is None else Diagnose(
            diagnostic_file, darker_target, fps
        )
        sar_val = float(sar) if sar is not None else src.info.sar
        frame0 = src.read()
        if frame0 is None:
            raise EOFError(f"no frames decoded from {file}")
        frame_shape = frame0.shape
        dia.update_ratio(frame_shape)  # frame 1 sets the scale only
        if progress is not None:
            est = n - 1
            fc = getattr(src.info, "frame_count", 0) or 0
            nf = getattr(src.info, "fps", 0) or 0
            if stop >= DEFAULT_MAX_DURATION_SECONDS and fc and nf:
                est = min(est, max(int(np.round(fc * fps / nf)) - 1, 1))
            user_cb, est_total = progress, est

            def progress(done, _t, _cb=user_cb, _est=est_total):
                _cb(done, _est)
        fill = mode_u8_host(frame0)
        spec = make_spec(frame_shape, window_size, target_width, darker_target)
        fns = tracker_fns(spec)

        fill_dev = np.uint8(fill)
        if autodetect:
            from .parallel.mesh import global_detect_peaks

            peaks = global_detect_peaks(spec, int(n_targets), min_distance)
            guesses = np.asarray(peaks(jnp.asarray(frame0), fill_dev), np.int32)
            # exhausted suppression repeats the last peak — reject instead of
            # seeding duplicate trackers pinned to the same blob
            if len({tuple(g) for g in guesses}) < len(guesses):
                raise ValueError(
                    f"auto-detect found fewer than n_targets={n_targets} "
                    "separable peaks (frame too small for min_distance, or "
                    "fewer targets present) — lower n_targets/min_distance "
                    "or pass explicit start_locations"
                )
        else:
            guesses = np.array(
                [_resolve_guess(loc, sar_val, frame_shape) for loc in start_locations],
                np.int32,
            )
        if subpixel:
            pos, off0 = fns.snap_multi_sub(jnp.asarray(frame0), jnp.asarray(guesses), fill_dev)
            offs = [np.asarray(off0)[None]]
        else:
            pos = fns.snap_multi(jnp.asarray(frame0), jnp.asarray(guesses), fill_dev)
            offs = []

        out = [np.asarray(pos)[None]]
        last_frame = 1
        N = guesses.shape[0]
        mode = "predict" if depth_gate > 0 else "contain"
        ch, cw, _ = roi_geometry(spec, roi_frames, depth_gate, mode)
        use_roi = stream == "roi" or (
            stream == "auto" and N * ch * cw * 2 < frame_shape[0] * frame_shape[1]
        )
        if n > 1 and use_roi:
            timer = Timer()
            pos_blocks, off_blocks, tracked = run_multi_roi_pipeline(
                src,
                spec,
                np.asarray(pos),
                fill,
                n - 1,
                roi_frames=roi_frames,
                depth=pipeline_depth,
                timer=timer,
                prefetchers=prefetchers,
                engine=engine,
                subpixel=subpixel,
                dia=dia,
                progress=progress,
                auto_cap=depth_gate if pipeline_depth == "auto" else None,
            )
            out.extend(pos_blocks)
            offs.extend(off_blocks)
            last_frame += tracked
            if timer.totals:
                logger.debug(
                    "track_multi %s: N=%d, %d frames, stream=roi, sections=%s",
                    file, N, tracked,
                    {k: round(v, 3) for k, v in timer.totals.items()},
                )
        elif n > 1:
            from .api import padded_chunks

            prefetch = ChunkPrefetcher(src, chunk_size, max_frames=n - 1)
            prefetchers.append(prefetch)
            for chunk, chunk_in, k in padded_chunks(prefetch, chunk_size):
                if subpixel:
                    pos_t, off_t = fns.scan_multi_sub(jnp.asarray(chunk_in), pos, fill_dev)
                    offs.append(np.asarray(off_t[:k]))
                else:
                    pos_t = fns.scan_multi(jnp.asarray(chunk_in), pos, fill_dev)
                pos = pos_t[k - 1]
                pos_np = np.asarray(pos_t[:k])  # blocks: device done with chunk
                out.append(pos_np)
                if not isinstance(dia, Dont):
                    for i in range(k):
                        dia(chunk[i], pos_np[i])
                prefetch.recycle(chunk)
                last_frame += k
                if progress is not None:
                    progress(last_frame - 1, n - 1)
    finally:
        for p in prefetchers:
            p.close()
        src.close()
        if dia is not None:
            dia.close()

    positions = np.concatenate(out, axis=0)
    if subpixel:
        off_all = np.concatenate(offs, axis=0)
        sz = np.array(frame_shape) - 1
        return ts[:last_frame], np.clip(
            positions[:last_frame].astype(np.float64) + off_all[:last_frame], 0, sz
        )
    return ts[:last_frame], positions[:last_frame]
