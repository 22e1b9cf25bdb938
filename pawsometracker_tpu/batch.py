"""Batched multi-video tracking — the framework's primary TPU scale-out API.

The reference processes videos strictly sequentially (reference:
src/PawsomeTracker.jl:203-207). On TPU the per-video scan is sequential but
*independent* across videos, so ``track_batch`` tracks B videos per device step
(``vmap`` over the batch axis) and shards the batch across chips via a device
mesh (``jax.sharding``; see :mod:`.parallel.mesh`). Host decode runs one
prefetch thread per video, assembling lockstep ``[B, T, H, W]`` chunks.
"""

from __future__ import annotations

import logging

import numpy as np

from .api import DEFAULT_CHUNK_SIZE, DEFAULT_MAX_DURATION_SECONDS, IJ, _resolve_guess
from .io.decode import ChunkPrefetcher, open_source
from .models.dog_tracker import make_spec
from .ops.dog_kernel import fix_window_size, guess_window_size
from .ops.filters import mode_u8_host
from .parallel.mesh import ShardedBatchTracker

__all__ = ["track_batch"]

logger = logging.getLogger(__name__)


def _broadcast(x, n, default):
    if x is None:
        return [default] * n
    if isinstance(x, (list, tuple)):
        if len(x) != n:
            raise ValueError(f"expected {n} entries, got {len(x)}")
        return [default if v is None else v for v in x]
    return [x] * n


def _resolve_mesh(mesh, B: int):
    """Resolve ``mesh="auto"`` for a bucket of ``B`` videos: a pure
    data-parallel mesh over the most local devices whose data axis divides
    ``B`` (sharding the leading batch axis needs exact divisibility). One
    device — or no usable divisor — means single-device execution (None),
    which is always correct; results are identical either way (pinned by
    tests/test_sharding.py)."""
    if mesh != "auto":
        return mesh
    import jax

    n = len(jax.devices())
    n = min(n, B)
    while n > 1 and B % n:
        n -= 1
    if n < 2:
        return None
    from .parallel.mesh import make_mesh

    return make_mesh(n)


def _is_single_location(x):
    """True for one start_location value (IJ or numeric (x, y)), as opposed to
    a per-file list of locations."""
    if x is None or isinstance(x, IJ):
        return True
    return (
        isinstance(x, tuple)
        and len(x) == 2
        and all(isinstance(v, (int, float, np.integer, np.floating)) for v in x)
    )


def track_batch(
    files,
    *,
    start=None,
    stop=None,
    target_width=25,
    start_location=None,
    window_size=None,
    darker_target=True,
    fps: float = 24,
    sar: float | None = None,
    mesh=None,
    backend: str = "auto",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    stream: str = "auto",
    roi_frames: int | None = None,
    pipeline_depth: int | str = "auto",
    diagnostic_files=None,
    engine: str = "auto",
    subpixel: bool = False,
    decode_workers: int | None = None,
    fast_decode: bool | None = None,
    progress=None,
    input_fps: float | None = None,
):
    """Track one target in each of ``files`` concurrently on the device.

    Entries of ``files`` may be in-memory uint8 frame arrays ``[T, H, W]`` /
    ``[T, H, W, 3]`` (see :func:`.api.track`), mixed freely with paths;
    ``input_fps`` states the arrays' native rate (default: already at
    ``fps``).

    Unlike ``track(list)`` (consecutive segments of ONE recording, reference:
    src/PawsomeTracker.jl:176-214), every file here is an independent video.
    Videos may have DIFFERENT resolutions, and ``target_width`` /
    ``window_size`` / ``darker_target`` may be per-file lists: the batch is
    bucketed by tracker configuration (one vmapped engine per bucket, shared
    mesh) and results are returned in input order, each identical to a
    per-video :func:`.api.track` call. ``start``/``stop``/``start_location``
    may be scalars (broadcast) or per-file lists; ``start_location`` entries
    follow the same kinds as :func:`.api.track` (None / IJ / (x, y)).

    ``mesh``: a ``jax.sharding.Mesh`` to shard the batch across chips, or
    ``"auto"`` to build a data-parallel mesh over the local devices whenever
    more than one chip is present (each bucket uses the most devices whose
    count divides its batch; None = single device). ``diagnostic_files``:
    optional per-file overlay video
    paths (None entries disable). ``subpixel=True`` returns float positions
    (integer recurrence + parabolic response-peak refinement, exactly like
    :func:`.api.track`). Returns a list of ``(ts, positions)``.
    """
    files = list(files)
    B = len(files)
    if B == 0:
        return []
    tws = _broadcast(target_width, B, 25)
    wss = _broadcast(window_size, B, None) if isinstance(window_size, (list,)) else [window_size] * B
    darks = _broadcast(darker_target, B, True) if isinstance(darker_target, (list,)) else [darker_target] * B
    starts_in = _broadcast(start, B, None)
    stops_in = _broadcast(stop, B, None)
    locs_in = (
        [start_location] * B
        if _is_single_location(start_location)
        else _broadcast(start_location, B, None)
    )
    dias_in = _broadcast(diagnostic_files, B, None) if diagnostic_files else [None] * B

    # bucket by tracker configuration (+ resolution, probed cheaply): one
    # engine per bucket; all buckets share the mesh
    from .io.decode import probe as _probe

    keys, infos = [], []
    for f, tw, ws, dk in zip(files, tws, wss, darks):
        info = _probe(f)
        infos.append(info)
        keys.append((info.frame_shape, float(tw), None if ws is None else tuple(np.atleast_1d(ws)), bool(dk)))
    buckets: dict = {}
    for i, k in enumerate(keys):
        buckets.setdefault(k, []).append(i)

    bucket_cb = None
    if progress is not None:
        # aggregate across the whole batch: expected total from per-file
        # durations, capped by container frame counts on open-ended stops
        est_total = 0
        for i in range(B):
            t0 = 0.0 if starts_in[i] is None else float(starts_in[i])
            t1 = DEFAULT_MAX_DURATION_SECONDS if stops_in[i] is None else float(stops_in[i])
            ni = max(int(np.round(fps * (t1 - t0))) - 1, 0)
            fc, nf = infos[i].frame_count, infos[i].fps
            if t1 >= DEFAULT_MAX_DURATION_SECONDS and fc and nf:
                ni = min(ni, max(int(np.round(fc * fps / nf)) - 1, 1))
            est_total += ni
        done_base = {"n": 0}

        def bucket_cb(done_in_bucket):
            progress(done_base["n"] + done_in_bucket, est_total)

    results: list = [None] * B
    for k, idxs in buckets.items():
        sub = _track_batch_uniform(
            [files[i] for i in idxs],
            infos=[infos[i] for i in idxs],
            start=[starts_in[i] for i in idxs],
            stop=[stops_in[i] for i in idxs],
            target_width=tws[idxs[0]],
            start_location=[locs_in[i] for i in idxs],
            window_size=wss[idxs[0]],
            darker_target=darks[idxs[0]],
            fps=fps,
            sar=sar,
            mesh=mesh,
            backend=backend,
            chunk_size=chunk_size,
            stream=stream,
            roi_frames=roi_frames,
            pipeline_depth=pipeline_depth,
            diagnostic_files=[dias_in[i] for i in idxs],
            engine=engine,
            subpixel=subpixel,
            decode_workers=decode_workers,
            fast_decode=fast_decode,
            progress=bucket_cb,
            input_fps=input_fps,
        )
        for i, r in zip(idxs, sub):
            results[i] = r
        if bucket_cb is not None:
            done_base["n"] += sum(max(len(ij) - 1, 0) for _, ij in sub)
    return results


def _track_batch_uniform(
    files,
    *,
    infos=None,
    start=None,
    stop=None,
    target_width: float = 25,
    start_location=None,
    window_size=None,
    darker_target: bool = True,
    fps: float = 24,
    sar: float | None = None,
    mesh=None,
    backend: str = "auto",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    stream: str = "auto",
    roi_frames: int | None = None,
    pipeline_depth: int | str = "auto",
    diagnostic_files=None,
    engine: str = "auto",
    subpixel: bool = False,
    decode_workers: int | None = None,
    fast_decode: bool | None = None,
    progress=None,
    input_fps: float | None = None,
):
    """One-bucket core of :func:`track_batch`: all videos share a resolution
    and tracker configuration."""
    import jax.numpy as jnp

    from .diagnose import Diagnose, Dont

    files = list(files)
    B = len(files)
    if B == 0:
        return []
    mesh = _resolve_mesh(mesh, B)
    starts = [float(s) for s in _broadcast(start, B, 0.0)]
    stops = [float(s) for s in _broadcast(stop, B, DEFAULT_MAX_DURATION_SECONDS)]
    locs = (
        [start_location] * B if _is_single_location(start_location) else _broadcast(start_location, B, None)
    )
    if window_size is None:
        window_size = guess_window_size(target_width)
    window_size = fix_window_size(window_size)

    from .api import _check_choice, _resolve_roi_frames

    _check_choice("stream", stream, ("auto", "roi", "full"))
    _check_choice("backend", backend, ("auto", "native", "opencv"))
    _check_choice("engine", engine, ("auto", "pallas", "xla"))

    if pipeline_depth == "auto":
        from .pipeline import AUTO_DEPTH_MAX, auto_depth_cap

        auto_depth, depth_gate = True, AUTO_DEPTH_MAX
    else:
        auto_depth, depth_gate = False, max(0, int(pipeline_depth))
    mode = "predict" if depth_gate > 0 else "contain"
    # raw speculation intent goes to the resolver (it owns the depth-0 ->
    # contain rule); `mode` stays for the retention/geometry decisions below
    roi_frames = _resolve_roi_frames(roi_frames, depth_gate, "predict")
    # ONE gate for the retained native path: ring sizing here, the per-source
    # capability check completes it after the sources are open
    dia_paths = _broadcast(diagnostic_files, B, None) if diagnostic_files else [None] * B
    # per-lane overlays ride the retained ring too (zero-copy views at accept
    # time), so diagnostics don't gate retention — provided the .so serves
    # the views (probed pre-open; a stale .so would otherwise allocate B
    # retention-sized rings its prefetcher fallback cannot use). The
    # per-source capability check (can_view_retained) completes the gate
    # after the opens.
    from .api import _views_available

    retention_possible = (
        stream != "full" and mode == "predict"
        and (all(p is None for p in dia_paths) or _views_available())
    )
    if auto_depth:
        from .api import _auto_ring_gate

        # each of the B videos opens its own retained ring, so the budget is
        # divided across lanes (PAWS_RING_BUDGET_MB bounds the TOTAL);
        # clamp by the LARGEST probeable frame so no source's ring is
        # smaller than the shared controller depth needs. Frame shapes come
        # from the caller's probe infos (track_batch probed each file ONCE
        # for bucketing) — re-probing here would demux every container a
        # second time; direct callers without infos fall back to the
        # per-file header probe inside the gate.
        per_file_infos = infos if infos is not None else [None] * B
        depth_gate = min(
            (
                _auto_ring_gate(
                    f, roi_frames, depth_gate, lanes=B, info=i,
                    # passthrough ndarrays serve chunk VIEWS: no ring, no
                    # retained copies — nothing for the budget to bound
                    zero_copy=(
                        isinstance(f, np.ndarray) and f.ndim == 3
                        and input_fps is None and t0 == 0.0
                    ),
                )
                for f, i, t0 in zip(files, per_file_infos, starts)
            ),
            default=depth_gate,
        )
    ring = (depth_gate + 2) * roi_frames + 8 if retention_possible else None

    sources = []
    try:
        for f, t0, t1 in zip(files, starts, stops):
            sources.append(
                open_source(f, start=t0, stop=t1, fps=fps, backend=backend,
                            prefetch=ring, workers=decode_workers,
                            input_fps=input_fps, fast_decode=fast_decode)
            )

        shapes = {s.info.frame_shape for s in sources}
        if len(shapes) != 1:
            raise ValueError(f"all videos in a batch must share one resolution, got {shapes}")
        frame_shape = shapes.pop()

        ns = [int(np.round(fps * (t1 - t0))) for t0, t1 in zip(starts, stops)]
        frames0 = []
        for f, s in zip(files, sources):
            fr = s.read()
            if fr is None:
                raise EOFError(f"no frames decoded from {f}")
            frames0.append(fr)
        frames0 = np.stack(frames0)
        fills = np.array([mode_u8_host(f) for f in frames0], np.uint8)

        spec = make_spec(frame_shape, window_size, target_width, darker_target)
        tracker = ShardedBatchTracker(spec, mesh)

        guesses = np.array(
            [
                _resolve_guess(loc, sar if sar is not None else s.info.sar, frame_shape)
                for loc, s in zip(locs, sources)
            ],
            np.int32,
        )
        auto = np.array([loc is None for loc in locs])

        f0 = tracker.shard_chunk(frames0)
        fills_dev = jnp.asarray(fills)
        g_dev = jnp.asarray(guesses)
        auto_col = jnp.asarray(auto)[:, None]
        if subpixel:
            pos_norm, off_norm = tracker.snap_sub(f0, g_dev, fills_dev)
            if auto.any():
                pos_det, off_det = tracker.snap_detect_sub(f0, g_dev, fills_dev)
                pos = jnp.where(auto_col, pos_det, pos_norm)
                off0 = np.asarray(jnp.where(auto_col, off_det, off_norm))
            else:
                pos, off0 = pos_norm, np.asarray(off_norm)
        else:
            pos_norm = tracker.snap(f0, g_dev, fills_dev)
            if auto.any():
                pos_det = tracker.snap_detect(f0, g_dev, fills_dev)
                pos = jnp.where(auto_col, pos_det, pos_norm)
            else:
                pos = pos_norm
            off0 = np.zeros((B, 2), np.float32)

        positions = [[np.asarray(pos[b])] for b in range(B)]
        offsets = [[off0[b].reshape(1, 2)] for b in range(B)]
        counts = [1] * B

        dias = []
        for p, fr0 in zip(dia_paths, frames0):
            d = Dont() if p is None else Diagnose(p, darker_target, fps)
            d.update_ratio(fr0.shape)
            dias.append(d)

        # ROI streaming (mirrors api._track_one): ship only drift-bounded
        # crops per video instead of full frames, speculatively PIPELINED by
        # the ONE shared controller (pipeline.SpeculativePipeline): crops are
        # aimed by velocity prediction with the synchronous margin + slack,
        # chunk scans chain their start positions on device, results are
        # containment-validated at (lagged) drain time and replayed on a
        # mispredict — the batch never blocks on a per-chunk host<->device
        # round trip and bytes/frame stay at synchronous levels.
        from .pipeline import (
            PerVideoSource,
            SpeculativePipeline,
            _BatchedEngine,
            _select_batched_bounded,
            _select_sharded_bounded,
            auto_depth_cap,
            roi_geometry,
        )
        from .utils.profiling import Timer

        ch, cw, margin = roi_geometry(spec, roi_frames, depth_gate, mode)
        use_roi = stream == "roi" or (
            stream == "auto" and ch * cw * 2 < frame_shape[0] * frame_shape[1]
        )
        if use_roi:
            chunk_size = roi_frames
            roi_spec = make_spec((ch, cw), window_size, target_width, darker_target)
            roi_engine = ShardedBatchTracker(roi_spec, mesh)
            if mesh is None:
                scan_bounded = _select_batched_bounded(
                    roi_engine, roi_spec, roi_frames, B, int(fills[0]), engine,
                    subpixel=subpixel,
                )
            else:
                # sharded path: measured fused-Pallas-per-chip via shard_map
                # when it wins (and B divides the data axis), else vmapped XLA
                scan_bounded = _select_sharded_bounded(
                    roi_engine, roi_spec, roi_frames, B, int(fills[0]), engine,
                    mesh, subpixel=subpixel,
                )
        # native retained mode: every source crops (and replays) in C++ —
        # full frames never enter Python for the whole batch
        nat_retained = (
            use_roi
            and retention_possible
            and all(
                hasattr(s, "read_roi_chunk_retained")
                and getattr(s, "ring_frames", 0) >= (depth_gate + 2) * roi_frames
                and (p is None or getattr(s, "can_view_retained", False))
                for s, p in zip(sources, dia_paths)
            )
        )
        if nat_retained:
            prefetcher_objs = []
        else:
            prefetcher_objs = [
                ChunkPrefetcher(s, chunk_size, max_frames=n - 1) for s, n in zip(sources, ns)
            ]
        pos_host = np.array(pos)  # newest DOWNLOADED positions per video

        if use_roi:
            timer = Timer()

            def sink(abs_pos, valid_e, off_np):
                for b in range(B):
                    k = int(valid_e[b])
                    if k > 0:
                        positions[b].append(abs_pos[b, :k])
                        if off_np is not None:
                            offsets[b].append(off_np[b, :k])
                        counts[b] += k
                if progress is not None:
                    # counts include frame 1 per video; progress reports
                    # frames tracked PAST it (matching the single-video API)
                    progress(int(sum(counts)) - B)

            pipe = SpeculativePipeline(
                L=B,
                K=roi_frames,
                crop_shape=(ch, cw),
                margin=margin,
                spec=spec,
                mode=mode,
                depth="auto" if auto_depth else depth_gate,
                # ring gate, re-bounded by the TRUE decoded size (covers
                # unprobeable inputs whose gate stayed unclamped); view-serving
                # array sources retain no copies, so nothing to bound there
                auto_cap=(
                    depth_gate
                    if all(getattr(s, "serves_views", False) for s in sources)
                    else min(depth_gate,
                             auto_depth_cap(frame_shape, roi_frames, lanes=B))
                ) if auto_depth else None,
                engine=_BatchedEngine(
                    scan_bounded, (ch, cw), frame_shape, fills_dev, subpixel,
                    timer,
                    # meshless: shard=None enables group dispatch (the engine
                    # places host arrays with jnp.asarray itself); under a
                    # mesh the explicit placement fn pins per-chunk dispatch
                    shard=None if roi_engine.mesh is None else roi_engine.shard_chunk,
                ),
                source=PerVideoSource(
                    sources, K=roi_frames, ch=ch, cw=cw, fills=fills, dias=dias,
                    ns=ns, nat_retained=nat_retained, prefetcher_objs=prefetcher_objs,
                ),
                sink=sink,
                timer=timer,
            )
            pipe.run(pos_host.astype(np.int64), max(ns) - 1)
            if timer.totals:
                logger.debug(
                    "track_batch B=%d: %d frames, stream=roi, sections=%s",
                    B,
                    sum(counts),
                    {k: round(v, 3) for k, v in timer.totals.items()},
                )
        else:
            active = [True] * B
            last_frames = [frames0[b] for b in range(B)]
            prefetch_iters = [iter(p) for p in prefetcher_objs]

            def _gather():
                """One chunk per active video; marks EOF videos inactive."""
                valid = np.zeros(B, np.int64)
                chunks = [None] * B
                for b in range(B):
                    if active[b]:
                        chunk = next(prefetch_iters[b], None)
                        if chunk is None or chunk.shape[0] == 0:
                            active[b] = False
                        else:
                            k = chunk.shape[0]
                            valid[b] = k
                            chunks[b] = chunk
                            if k < chunk_size:
                                active[b] = False
                return valid, chunks

            batch = np.empty((B, chunk_size) + frame_shape, np.uint8)
            if subpixel:
                # full-frame coordinates: no per-frame rebase, frame-bound clamp
                deltas_full = jnp.zeros((B, chunk_size, 2), jnp.int32)
                lo_full = jnp.zeros((B, chunk_size, 2), jnp.int32)
                hi_full = jnp.asarray(
                    np.tile(np.array(frame_shape, np.int32) - 1, (B, chunk_size, 1))
                )
            while any(active):
                valid, chunks = _gather()
                if valid.sum() == 0:
                    break
                for b in range(B):
                    k = int(valid[b])
                    if k > 0:
                        batch[b, :k] = chunks[b]
                        last_frames[b] = np.array(chunks[b][-1])
                        if k < chunk_size:
                            batch[b, k:] = chunks[b][-1]
                    else:
                        batch[b] = last_frames[b]
                if subpixel:
                    out, off = tracker.scan_sub(
                        tracker.shard_chunk(batch),
                        tracker.shard_chunk(pos_host.astype(np.int32)),
                        fills_dev,
                        deltas_full,
                        lo_full,
                        hi_full,
                    )
                    off_host = np.asarray(off)
                else:
                    out = tracker.scan(
                        tracker.shard_chunk(batch),
                        tracker.shard_chunk(pos_host.astype(np.int32)),
                        fills_dev,
                    )
                    off_host = None
                scan_host = np.asarray(out)
                for b in range(B):
                    k = int(valid[b])
                    if k > 0:
                        positions[b].append(scan_host[b, :k])
                        if off_host is not None:
                            offsets[b].append(off_host[b, :k])
                        counts[b] += k
                        pos_host[b] = scan_host[b, k - 1]
                        for i in range(k):
                            dias[b](chunks[b][i], scan_host[b, i])
                    if chunks[b] is not None:
                        prefetcher_objs[b].recycle(chunks[b])
                if progress is not None:
                    # counts include frame 1 per video; progress reports
                    # frames tracked PAST it (matching the single-video API)
                    progress(int(sum(counts)) - B)
    finally:
        for p in locals().get("prefetcher_objs", []):
            p.close()  # join decode threads BEFORE destroying the sources
        for s in sources:
            s.close()
        for d in locals().get("dias", []):
            d.close()

    out = []
    sz = np.array(frame_shape) - 1
    for b in range(B):
        ts = np.linspace(starts[b], stops[b], ns[b])[: counts[b]]
        ij = np.concatenate([p.reshape(-1, 2) for p in positions[b]], axis=0)[: counts[b]]
        if subpixel:
            off = np.concatenate([o.reshape(-1, 2) for o in offsets[b]], axis=0)[: counts[b]]
            ij = np.clip(ij.astype(np.float64) + off, 0, sz)
        out.append((ts, ij))
    return out
