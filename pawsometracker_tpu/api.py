"""Public tracking API.

``track(file | files, ...)`` preserves the reference's API surface and
semantics (reference: src/PawsomeTracker.jl:109-214) on a TPU-native engine:
host decode (overlapped, chunked) feeding a jitted ``lax.scan`` tracker.

Coordinate conventions (0-based everywhere; ``julia = python + 1``):

- ``start_location=None`` — auto-detect in a quarter-frame window centered on
  the frame (reference: src/PawsomeTracker.jl:99-107).
- ``start_location=IJ(i, j)`` — raw frame index (row i, col j), the analog of
  the reference's ``CartesianIndex`` (src/PawsomeTracker.jl:74-77).
- ``start_location=(x, y)`` — *display* pixel coordinates from the left-top
  corner; x is divided by the sample aspect ratio to get the raw column
  (src/PawsomeTracker.jl:79-84).

Returns ``(ts, positions)``: ``ts`` float64 seconds, ``positions`` int
``[N, 2]`` of (row, col).
"""

from __future__ import annotations

import functools
import logging

from typing import NamedTuple, Sequence

import numpy as np

from .utils.profiling import Timer

logger = logging.getLogger("pawsometracker_tpu")

from .diagnose import diagnose
from .io.decode import ChunkPrefetcher, open_source
from .models.dog_tracker import (
    autodetect_spec,
    center_guess,
    make_spec,
    tracker_fns,
)
from .ops.dog_kernel import fix_window_size, guess_window_size
from .ops.filters import mode_u8_host
from .pipeline import (
    auto_depth_cap as _pipeline_auto_depth_cap,
    roi_geometry,
    run_full_pipeline,
    run_roi_pipeline,
)

#: 24 hours minus 1 millisecond (reference: src/PawsomeTracker.jl:19)
DEFAULT_MAX_DURATION_SECONDS = 86399.999

#: frames per device scan call; the host decodes the next chunk while the
#: device tracks the current one
DEFAULT_CHUNK_SIZE = 64

__all__ = ["track", "IJ", "DEFAULT_MAX_DURATION_SECONDS"]


class IJ(NamedTuple):
    """A raw (row, col) frame index, 0-based — the ``CartesianIndex`` analog."""

    i: int
    j: int


def _check_choice(name: str, value, allowed: tuple) -> None:
    """Enum-like kwargs fail loudly on typos: stream='roo' silently fell
    through to full-frame streaming, speculate='contian' silently ran
    contain mode — both perf cliffs with no signal."""
    if value not in allowed:
        raise ValueError(f"{name} must be one of {allowed}, got {value!r}")


def _resolve_guess(start_location, sar: float, frame_shape) -> tuple[int, int]:
    """Start-location resolution (reference: src/PawsomeTracker.jl:74-90)."""
    if start_location is None:
        return center_guess(frame_shape)
    if isinstance(start_location, IJ):
        return (int(start_location.i), int(start_location.j))
    if isinstance(start_location, np.ndarray) and start_location.shape == (2,):
        start_location = tuple(start_location.tolist())  # (x, y) like a tuple
    if isinstance(start_location, Sequence) and len(start_location) == 2:
        x, y = start_location
        # x is in display pixels; divide by SAR to get the raw column.
        # np.round matches Julia's round-half-even.
        return (int(np.round(y)), int(np.round(x / sar)))
    raise TypeError(f"invalid start_location: {start_location!r}")


def _initial_position(frame0: np.ndarray, guess, auto: bool, spec, fill: int, subpixel: bool = False):
    """Snap onto the target in frame 1. Even with a user-provided location the
    tracker runs one step, so ``positions[0]`` is the *detected* position near
    the given location (reference: src/PawsomeTracker.jl:92-107)."""
    import jax.numpy as jnp

    frame_dev = jnp.asarray(frame0)
    g = jnp.asarray(np.asarray(guess, np.int32))
    fill = np.uint8(fill)
    fns = tracker_fns(autodetect_spec(spec)) if auto else tracker_fns(spec)
    if subpixel:
        pos, off = fns.snap_sub(frame_dev, g, fill)
        return pos, np.asarray(off)
    return fns.snap(frame_dev, g, fill), np.zeros(2, np.float32)


def _views_available() -> bool:
    """True when the native layer can serve zero-copy retained-frame views
    (fresh .so with ``pawsio_retained_ptr``) — the capability the
    diagnostics-on retained-ring path needs (probed BEFORE open so a stale
    .so never allocates a retention-sized ring it cannot use)."""
    try:
        from .io.native_io import _load

        return hasattr(_load(), "pawsio_retained_ptr")
    except Exception:
        return False


def _on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=128)
def _full_scan_sub(spec):
    """Whole-frame subpixel scan with the bounds pinned to the frame — jitted
    once per spec (a per-call ``jax.jit(lambda ...)`` would recompile on
    every ``track(..., subpixel=True, stream="full")`` call)."""
    import jax
    import jax.numpy as jnp

    fns_full = tracker_fns(spec)
    hi_row = np.array(spec.frame_shape, np.int32) - 1

    def run(c, p, f):
        T = c.shape[0]
        deltas = jnp.zeros((T, 2), jnp.int32)
        lo_s = jnp.zeros((T, 2), jnp.int32)
        hi_s = jnp.asarray(np.tile(hi_row, (T, 1)))
        return fns_full.scan_sub(c, p, f, deltas, lo_s, hi_s)

    return jax.jit(run)


def _scan_fn_for(spec, engine: str):
    """Pick the device scan implementation: the fused Pallas kernel on TPU
    ('auto'/'pallas'), the XLA lax.scan path otherwise ('xla')."""
    if engine == "pallas" or (engine == "auto" and _on_tpu()):
        try:
            from .ops.pallas_tracker import pallas_scan_fn

            return pallas_scan_fn(spec)
        except Exception:
            if engine == "pallas":
                raise
    return tracker_fns(spec).scan


#: frames per ROI mini-chunk; None = auto (12 in predict mode — measured
#: fastest once the error-gated depth controller made replay cost
#: K-independent; contain mode keeps 8, shrinking with depth to hold the
#: crop size constant — see _resolve_roi_frames)
DEFAULT_ROI_FRAMES = None

#: chunks the host may run ahead of the device. "auto" adapts at runtime from
#: the measured drain latency (pipeline.run_roi_pipeline): identical results
#: at every depth, deepens only while the round trip isn't hidden — so it is
#: better-or-equal to any fixed depth in every environment (PCIe stays
#: shallow, high-RTT links deepen to AUTO_DEPTH_MAX)
DEFAULT_PIPELINE_DEPTH = "auto"


def _auto_ring_gate(file, roi_frames: int, depth_gate: int, lanes: int = 1,
                    info=None, zero_copy: bool = False) -> int:
    """Memory-aware depth gate for ``pipeline_depth="auto"`` ring sizing:
    when the frame size is knowable BEFORE open (ndarray input, a caller's
    already-probed ``info``, or a cheap native header probe), clamp the gate
    so the retained C++ decode ring ((gate+2)*K preallocated gray8 frames)
    respects PAWS_RING_BUDGET_MB — the same bound
    :func:`pipeline.auto_depth_cap` applies to the runtime depth, so the
    controller never outruns the ring. Unprobeable inputs keep the unclamped
    gate (the ring is then merely never undersized). ``info``: a
    :class:`~.io.decode.VideoInfo` the caller probed already (track_batch
    probes once for bucketing) — passing it avoids a second header read.
    ``zero_copy``: the input is a passthrough ndarray whose chunks are served
    as VIEWS (no decode ring, no retained copies), so the memory budget has
    nothing to bound — the gate is returned unclamped."""
    from .pipeline import auto_depth_cap

    if zero_copy:
        return depth_gate
    shape = None
    if info is not None:
        if info.height > 0 and info.width > 0:
            shape = (int(info.height), int(info.width))
    elif hasattr(file, "shape") and getattr(file, "ndim", 0) >= 3:
        shape = (int(file.shape[1]), int(file.shape[2]))
    else:
        try:
            from .io.native_io import native_probe

            probed = native_probe(file)
            if probed.height > 0 and probed.width > 0:
                shape = (int(probed.height), int(probed.width))
        except Exception:
            shape = None
    if shape is None:
        return depth_gate
    return min(depth_gate, auto_depth_cap(shape, roi_frames, lanes=lanes))


def _resolve_roi_frames(roi_frames, pipeline_depth: int, speculate: str = "predict") -> int:
    """Auto ROI chunk length. Owns the EFFECTIVE-mode rule: ``depth == 0``
    always runs contain geometry regardless of the ``speculate`` kwarg (the
    pipeline frontends derive mode the same way), so callers pass their raw
    arguments and cannot re-introduce the K-of-the-wrong-mode bug."""
    if roi_frames is not None:
        return int(roi_frames)
    if speculate == "predict" and int(pipeline_depth) > 0:
        # predict-mode crops don't grow with depth (slack is small) OR with
        # K while K <= 2*window_radius (the slack floor), so a longer chunk
        # amortizes the per-chunk host work (ctypes crop call, H2D staging,
        # dispatch, drain) for free. K=12 measured fastest on the v5e bench
        # host with the error-gated depth controller (K=8: 444 fps, K=12:
        # 500, K=16: replay-prone at 461, K=24: storms); the pre-controller
        # sweep picked 8 because replay cost then grew with K.
        return 12
    # contain mode (incl. depth 0): the crop half-extent is (depth+1)*K*r —
    # K goes straight into bytes/frame there (K=12 would be +50% per axis at
    # depth 0), so keep the synchronous K=8 and shrink with depth to hold
    # the crop size constant across speculation depths
    return max(1, 8 // (int(pipeline_depth) + 1))


def padded_chunks(prefetch: ChunkPrefetcher, chunk_size: int):
    """Yield ``(chunk, chunk_in, k)`` where ``chunk_in`` is ``chunk`` padded to
    the static scan length by repeating the last frame (padded steps are
    discarded by the caller). Shared by the single-target and multi-target
    full-frame streaming loops."""
    for chunk in prefetch:
        k = chunk.shape[0]
        if k < chunk_size:
            pad = np.repeat(chunk[-1:], chunk_size - k, axis=0)
            chunk_in = np.concatenate([chunk, pad], axis=0)
        else:
            chunk_in = chunk
        yield chunk, chunk_in, k


def _track_one(
    file,
    start: float,
    stop: float,
    target_width: float,
    start_location,
    window_size: tuple[int, int],
    darker_target: bool,
    fps: float,
    dia,
    *,
    sar: float | None = None,
    backend: str = "auto",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    engine: str = "auto",
    stream: str = "auto",
    roi_frames: int | None = DEFAULT_ROI_FRAMES,
    pipeline_depth: int | str = DEFAULT_PIPELINE_DEPTH,
    speculate: str = "predict",
    subpixel: bool = False,
    decode_workers: int | None = None,
    fast_decode: bool | None = None,
    progress=None,
    input_fps: float | None = None,
):
    """Track one file (reference pipeline: src/PawsomeTracker.jl:148-174)."""
    import jax.numpy as jnp

    t = stop - start
    # length-based timestamp range: step = t/(n-1), slightly != 1/fps by design
    # (reference: src/PawsomeTracker.jl:149-152)
    n = int(np.round(fps * t))
    if n < 1:
        raise ValueError(f"no frames to track in [{start}, {stop}] at fps={fps}")
    ts = np.linspace(start, stop, n)

    # size the native decode ring so the speculative ROI pipeline can RETAIN
    # its in-flight chunks for mispredict replay (pipeline.py) — only when
    # that path can actually run (ROI not disabled, predict mode; with a
    # diagnostic file additionally a .so serving zero-copy retained views:
    # otherwise keep the small default ring and its memory footprint)
    # "auto": the ROI pipeline adapts depth at runtime from the measured drain
    # latency (pipeline.run_roi_pipeline); gates/sizing here use the cap
    if pipeline_depth == "auto" and speculate == "contain":
        # contain-mode crops GROW with depth (no validation/replay machinery
        # to lean on), so auto stays at the conservative fixed depth
        pipeline_depth = 1
    if pipeline_depth == "auto":
        from .pipeline import AUTO_DEPTH_MAX

        depth_gate = AUTO_DEPTH_MAX
    else:
        pipeline_depth = depth_gate = max(0, int(pipeline_depth))
    roi_frames = _resolve_roi_frames(roi_frames, depth_gate, speculate)
    from .diagnose import Dont

    # diagnostics no longer force the slow path: the overlay writer reads
    # zero-copy retained-frame views straight from the C++ decode ring at
    # drain time (SingleVideoSource.accept), so the ring is sized for
    # retention with a diagnostic file too — PROVIDED the .so can serve the
    # views (a stale prebuilt .so falls back to the Python prefetcher, where
    # a retention-sized ring would be pure memory overhead)
    retention_possible = (
        stream != "full" and depth_gate > 0 and speculate == "predict"
        and (isinstance(dia, Dont) or _views_available())
    )
    zero_copy_input = (
        isinstance(file, np.ndarray) and file.ndim == 3
        and input_fps is None and start == 0.0
    )
    if pipeline_depth == "auto" and stream != "full":
        # (the full-frame path derives its own budgeted depth and never
        # retains a ring, so the header probe would be dead per-call I/O)
        depth_gate = _auto_ring_gate(file, roi_frames, depth_gate,
                                     zero_copy=zero_copy_input)
    ring = (depth_gate + 2) * roi_frames + 8 if retention_possible else None
    src = open_source(
        file, start=start, stop=stop, fps=fps, backend=backend, prefetch=ring,
        workers=decode_workers, input_fps=input_fps, fast_decode=fast_decode,
    )
    prefetchers: list[ChunkPrefetcher] = []  # joined in finally BEFORE src.close()
    try:
        if sar is None:
            sar_val = src.info.sar
        else:
            sar_val = float(sar)

        if progress is not None:
            # with the open-ended default stop, n is the 24-hour bound —
            # estimate the expected total from the container frame count
            # instead (still an estimate: VFR/resampling can shift it)
            est = n - 1
            fc = getattr(src.info, "frame_count", 0) or 0
            nf = getattr(src.info, "fps", 0) or 0
            if stop >= DEFAULT_MAX_DURATION_SECONDS and fc and nf:
                est = min(est, max(int(round(fc * fps / nf)) - 1, 1))
            user_cb, est_total = progress, est

            def progress(done, _t, _cb=user_cb, _est=est_total):
                _cb(done, _est)

        frame0 = src.read()
        if frame0 is None:
            raise EOFError(f"no frames decoded from {file}")
        frame_shape = frame0.shape
        dia.update_ratio(frame_shape)

        fill = mode_u8_host(frame0)  # mode of FIRST frame, used for all frames
        spec = make_spec(frame_shape, window_size, target_width, darker_target)
        guess = _resolve_guess(start_location, sar_val, frame_shape)
        pos, off0 = _initial_position(
            frame0, guess, start_location is None, spec, fill, subpixel
        )

        positions = [np.asarray(pos)]
        offsets = [off0.reshape(1, 2)]
        last_frame = 1

        # ROI streaming: for large frames, transfer only a drift-bounded crop
        # around the current position per mini-chunk instead of full frames —
        # host->device bytes drop ~(frame/crop) while results stay identical
        # (the crop provably contains every window the scan can visit). With
        # pipeline_depth >= 1 the crop speculates ahead of the device so no
        # stage ever blocks on the per-chunk round trip (see pipeline.py).
        mode = speculate if depth_gate > 0 else "contain"
        ch, cw, _ = roi_geometry(spec, roi_frames, depth_gate, mode)
        use_roi = stream == "roi" or (
            stream == "auto" and ch * cw * 2 < frame_shape[0] * frame_shape[1]
        )

        timer = Timer()
        if n > 1 and use_roi:
            # when the native decoder is active, crops are cut in C++ straight
            # from the decode ring: full frames never cross into Python. With
            # diagnostics ON this additionally needs zero-copy retained-frame
            # views (fresh .so) — the overlay resizes out of the ring
            native_roi = hasattr(src, "read_roi_chunk") and (
                isinstance(dia, Dont) or getattr(src, "can_view_retained", False)
            )
            pos_blocks, off_blocks, tracked = run_roi_pipeline(
                src,
                spec,
                np.asarray(pos),
                fill,
                n - 1,
                roi_frames=roi_frames,
                depth=pipeline_depth,
                engine=engine,
                subpixel=subpixel,
                dia=dia,
                timer=timer,
                native_roi=native_roi,
                prefetchers=prefetchers,
                speculate=speculate,
                progress=progress,
                auto_cap=depth_gate if pipeline_depth == "auto" else None,
            )
            positions.extend(pos_blocks)
            offsets.extend(off_blocks)
            last_frame += tracked
        elif n > 1:
            if subpixel:
                scan = _full_scan_sub(spec)
            else:
                scan = _scan_fn_for(spec, engine)
            pos_blocks, off_blocks, tracked = run_full_pipeline(
                src,
                spec,
                np.asarray(pos),
                fill,
                n - 1,
                chunk_size=chunk_size,
                # full-frame chunks are memory-heavy; "auto" keeps this
                # shallow: at most 3, bounded by the same ring budget that
                # governs the ROI path ((depth+2)*chunk_size full frames in
                # flight — small frames get 3, which allows dispatch groups
                # of 2; 4K drops to 1)
                depth=min(3, _pipeline_auto_depth_cap(frame_shape, chunk_size))
                if pipeline_depth == "auto" else pipeline_depth,
                scan=scan,
                subpixel=subpixel,
                dia=dia,
                timer=timer,
                prefetchers=prefetchers,
                progress=progress,
            )
            positions.extend(pos_blocks)
            offsets.extend(off_blocks)
            last_frame += tracked
        if timer.totals:
            logger.debug(
                "track %s: %d frames, stream=%s, sections=%s",
                file,
                last_frame,
                "roi" if use_roi else "full",
                {k: round(v, 3) for k, v in timer.totals.items()},
            )
    finally:
        for p in prefetchers:
            p.close()
        src.close()

    ij = np.concatenate([p.reshape(-1, 2) for p in positions], axis=0)
    if subpixel:
        off_all = np.concatenate(offsets, axis=0)
        sz = np.array(frame_shape) - 1
        ij_f = np.clip(ij[:last_frame].astype(np.float64) + off_all[:last_frame], 0, sz)
        return ts[:last_frame], ij_f
    return ts[:last_frame], ij[:last_frame]


def track(
    file,
    *,
    start=None,
    stop=None,
    target_width: float = 25,
    start_location=None,
    window_size=None,
    darker_target: bool = True,
    fps: float = 24,
    diagnostic_file: str | None = None,
    sar: float | None = None,
    backend: str = "auto",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    engine: str = "auto",
    stream: str = "auto",
    roi_frames: int | None = DEFAULT_ROI_FRAMES,
    pipeline_depth: int | str = DEFAULT_PIPELINE_DEPTH,
    speculate: str = "predict",
    subpixel: bool = False,
    decode_workers: int | None = None,
    fast_decode: bool | None = None,
    progress=None,
    input_fps: float | None = None,
):
    """Track a blob-like target in a video ``file`` (or list of segment files).

    ``file`` may also be an in-memory uint8 frame array ``[T, H, W]`` (gray)
    or ``[T, H, W, 3]`` (RGB) — recordings that never were video files (HDF5
    datasets, TIFF stacks, camera SDK buffers). ``input_fps`` states the
    array's native rate and the exact fps-filter resampling maps it onto the
    ``fps`` output grid (default ``None``: the frames are taken to be at
    ``fps`` already); decode knobs (``backend``, ``decode_workers``) don't
    apply. Lists may mix file paths and arrays per segment.

    Mirrors the reference API (reference: src/PawsomeTracker.jl:109-146 single
    file; :176-214 segmented). Keyword defaults: ``start=0``,
    ``stop=86399.999``, ``target_width=25`` (FWHM of the DoG center Gaussian),
    ``start_location=None`` (auto-detect), ``window_size`` from
    :func:`guess_window_size`, ``darker_target=True``, ``fps=24``,
    ``diagnostic_file=None``.

    Extensions over the reference: ``sar`` overrides the probed sample aspect
    ratio; ``backend`` picks the decode engine (``auto``/``native``/``opencv``);
    ``engine`` picks the device scan (``auto`` = measured pallas/xla choice on
    TPU); ``stream`` forces full-frame or ROI streaming (``auto`` = by crop
    size); ``roi_frames`` and ``pipeline_depth`` tune the speculative ROI
    pipeline (see :mod:`.pipeline`; depth 0 = synchronous, ``"auto"`` adapts
    at runtime from the measured drain latency — identical results either
    way); ``chunk_size`` tunes full-frame streaming granularity; ``subpixel``
    adds parabolic peak refinement to the returned (float) positions;
    ``decode_workers`` (default: the ``PAWSIO_DECODE_WORKERS`` env var)
    decodes with that many cooperating native decoders — bit-identical
    frames, for multi-core hosts (see :mod:`.io.parallel_decode`);
    ``fast_decode=True`` skips the h264 in-loop deblocking filter in the
    native decoder (~10-30% faster on decode-bound hosts; decoded pixels are
    NOT bit-exact vs a spec decode, but tracks stay inside the <1 px oracle —
    default ``None`` follows the ``PAWSIO_FAST_DECODE`` env var);
    ``progress`` is an optional ``callback(frames_done, frames_expected)``
    invoked after each accepted chunk of the CURRENT file (per-file on
    segmented inputs; ``frames_expected`` excludes frame 1 and can exceed
    the delivered count when the stream ends early).

    For a list of ``file``s the per-file ``start``/``stop``/``start_location``
    may be lists of the same length; a ``None`` start_location in segment k>0
    resumes from the previous segment's last position
    (reference: src/PawsomeTracker.jl:203-206).
    """
    _check_choice("stream", stream, ("auto", "roi", "full"))
    _check_choice("speculate", speculate, ("predict", "contain"))
    _check_choice("backend", backend, ("auto", "native", "opencv"))
    _check_choice("engine", engine, ("auto", "pallas", "xla"))
    if window_size is None:
        window_size = guess_window_size(target_width)
    window_size = fix_window_size(window_size)

    if isinstance(file, (list, tuple)) and not isinstance(file, IJ):
        return _track_many(
            list(file),
            start=start,
            stop=stop,
            target_width=target_width,
            start_location=start_location,
            window_size=window_size,
            darker_target=darker_target,
            fps=fps,
            diagnostic_file=diagnostic_file,
            sar=sar,
            backend=backend,
            chunk_size=chunk_size,
            engine=engine,
            stream=stream,
            roi_frames=roi_frames,
            pipeline_depth=pipeline_depth,
            speculate=speculate,
            subpixel=subpixel,
            decode_workers=decode_workers,
            fast_decode=fast_decode,
            progress=progress,
            input_fps=input_fps,
        )

    start = 0.0 if start is None else float(start)
    stop = DEFAULT_MAX_DURATION_SECONDS if stop is None else float(stop)
    with diagnose(diagnostic_file, darker_target, fps) as dia:
        return _track_one(
            file,
            start,
            stop,
            target_width,
            start_location,
            window_size,
            darker_target,
            fps,
            dia,
            sar=sar,
            backend=backend,
            chunk_size=chunk_size,
            engine=engine,
            stream=stream,
            roi_frames=roi_frames,
            pipeline_depth=pipeline_depth,
            speculate=speculate,
            subpixel=subpixel,
            decode_workers=decode_workers,
            fast_decode=fast_decode,
            progress=progress,
            input_fps=input_fps,
        )


def _track_many(
    files,
    *,
    start,
    stop,
    target_width,
    start_location,
    window_size,
    darker_target,
    fps,
    diagnostic_file,
    sar,
    backend,
    chunk_size,
    engine,
    stream,
    roi_frames,
    pipeline_depth,
    speculate,
    subpixel,
    decode_workers=None,
    fast_decode=None,
    progress=None,
    input_fps=None,
):
    """Segmented videos: chain each segment's start from the previous
    segment's final position (reference: src/PawsomeTracker.jl:181-214)."""
    nfiles = len(files)
    if start is not None and not isinstance(start, (list, tuple, np.ndarray)):
        start = [start] * nfiles  # scalar broadcast (convenience over reference)
    if stop is not None and not isinstance(stop, (list, tuple, np.ndarray)):
        stop = [stop] * nfiles
    starts = [0.0] * nfiles if start is None else [float(s) for s in start]
    stops = [DEFAULT_MAX_DURATION_SECONDS] * nfiles if stop is None else [float(s) for s in stop]
    if start_location is None:
        locs = [None] * nfiles
    elif isinstance(start_location, IJ) or (
        isinstance(start_location, tuple)
        and len(start_location) == 2
        and all(isinstance(v, (int, float, np.integer, np.floating)) for v in start_location)
    ):
        # one location broadcasts: it seeds segment 1, later segments chain
        # from the previous end (list(IJ(3, 5)) would otherwise unpack into
        # bogus per-file scalar entries)
        locs = [start_location] + [None] * (nfiles - 1)
    else:
        locs = list(start_location)
    if not (len(starts) == len(stops) == len(locs) == nfiles):
        raise ValueError(
            f"array length mismatch: files={nfiles}, start={len(starts)}, "
            f"stop={len(stops)}, start_location={len(locs)}"
        )

    tss, ijs = [], []
    with diagnose(diagnostic_file, darker_target, fps) as dia:
        end_location = None
        for f, t0, t1, loc in zip(files, starts, stops, locs):
            loc = loc if loc is not None else end_location
            ts_i, ij_i = _track_one(
                f,
                t0,
                t1,
                target_width,
                loc,
                window_size,
                darker_target,
                fps,
                dia,
                sar=sar,
                backend=backend,
                chunk_size=chunk_size,
                engine=engine,
                stream=stream,
                roi_frames=roi_frames,
                pipeline_depth=pipeline_depth,
                speculate=speculate,
                subpixel=subpixel,
                decode_workers=decode_workers,
                fast_decode=fast_decode,
                progress=progress,
                input_fps=input_fps,
            )
            tss.append(ts_i)
            ijs.append(ij_i)
            end_location = IJ(int(np.round(ij_i[-1][0])), int(np.round(ij_i[-1][1])))

    # merged timestamps assume all segments share segment 1's step — the
    # reference's uniform-fps convention (src/PawsomeTracker.jl:209-211)
    n = sum(len(t) for t in tss)
    step = (tss[0][1] - tss[0][0]) if len(tss[0]) > 1 else 1.0 / fps
    ts = tss[0][0] + step * np.arange(n)
    ij = np.concatenate(ijs, axis=0)
    return ts, ij
