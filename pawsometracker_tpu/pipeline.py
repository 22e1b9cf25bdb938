"""Speculative / pipelined ROI streaming.

Round-1 ROI streaming serialized each mini-chunk on a full host<->device round
trip: the device scan waited for the chunk's crop upload, and the next crop
waited for the scan's final position. This module removes both waits with two
complementary mechanisms (always bit-identical results — tests enforce it):

- **On-device position chaining** (both modes). Chunk ``c``'s scan consumes
  chunk ``c-1``'s final position directly on the device:
  ``pos0_rel(c) = out(c-1)[-1] + (origin(c-1) - origin(c))`` where the origin
  delta is a host-known constant. Scans dispatch back-to-back; the host only
  *downloads* positions ``depth`` chunks behind (for results, diagnostics, and
  to aim future crops), and those downloads are issued early with
  ``copy_to_host_async`` so the lagged reads rarely block.

- **Speculative crop origins**, two strategies:

  * ``speculate="predict"`` (default): the crop for chunk ``c`` is centered on
    a velocity-extrapolated position (the newest downloaded position plus its
    per-frame velocity times the staleness), with the SYNCHRONOUS margin
    ``K*radii + L//2`` plus a small slack. Bytes/frame stay at round-1 levels.
    At drain time the result is VALIDATED: every window the scan read must
    have been inside the crop (or beyond the true frame edge, where both the
    crop scan and a full-frame scan read the same mode-fill). On a mispredict
    the chunk and everything chained after it is replayed synchronously from
    retained frames with exact origins — rare for physical motion, and
    correctness never depends on the prediction.
  * ``speculate="contain"``: margins enlarged to ``(depth+1)*K*radii + L//2``
    so a position up to ``depth*K`` frames stale PROVABLY contains every
    window the scan can visit (the tracker moves at most ``radii`` per frame,
    reference hot loop: src/PawsomeTracker.jl:55-62). No validation or replay
    machinery, and the native decoder can crop in C++ (full frames never
    enter Python) — but crops grow quadratically with the staleness horizon.

``depth=0`` with ``contain`` reproduces the synchronous round-1 behavior
exactly (same crops, same margins).
"""

from __future__ import annotations

from collections import deque

import numpy as np

from .io.decode import ChunkPrefetcher
from .models.dog_tracker import make_spec, tracker_fns

__all__ = ["roi_geometry", "make_chained", "make_chained_batch", "run_roi_pipeline",
           "pick_bounded_engine", "pick_bounded_engine_batch"]

#: mispredict replays since import (observability: tests + debugging)
replay_count = 0

#: cap for pipeline_depth="auto" (bounds buffer/ring memory; in predict mode
#: geometry is depth-independent so the cap costs nothing to raise later)
AUTO_DEPTH_MAX = 3

#: pipeline_depth="auto" deepens when the lagged drain blocks longer than
#: this — shared by the single/multi/batch drain controllers so a tuning
#: change cannot silently diverge between the three pipelines
AUTO_DRAIN_BLOCK_S = 0.002


def _predict_slack(k_frames: int, depth: int, r: int) -> int:
    """Per-axis slack (px) added to the synchronous margin in predict mode:
    covers velocity-extrapolation error over the staleness horizon.

    Deliberately depth-INDEPENDENT: depth is then a pure latency-hiding knob —
    crop geometry (bytes/frame, jitted kernels, engine-cache entries) is
    identical at every depth, and a deeper pipeline costs nothing per frame.
    The price is a staler aim at higher depth (extrapolation error grows with
    ``depth*K`` while the slack doesn't), which only raises the mispredict-
    replay rate; correctness never depends on it (containment validation
    replays exactly). Small relative to the worst-case drift bound ``K*r``."""
    return max(4, (k_frames * r) // 8)


def roi_geometry(spec, k_frames: int, depth: int = 0, mode: str = "contain"):
    """``(crop_h, crop_w, margin)`` for K-frame ROI mini-scans at pipeline
    ``depth`` (chunks the host may run ahead of the device)."""
    ri, rj = spec.radii
    half = spec.kernel_len // 2
    if mode == "predict":
        mi = k_frames * ri + half + _predict_slack(k_frames, depth, ri)
        mj = k_frames * rj + half + _predict_slack(k_frames, depth, rj)
    else:
        mi = (depth + 1) * k_frames * ri + half
        mj = (depth + 1) * k_frames * rj + half
    return 2 * mi + 1, 2 * mj + 1, (mi, mj)


def make_chained(scan_bounded):
    """Wrap a bounded scan ``fn(frames, pos0, fill, lo, hi)`` so the start
    position is computed ON DEVICE from the previous chunk's (lazy) final
    position plus a host-known origin delta — the link that lets consecutive
    chunk scans dispatch without a host round-trip."""
    import jax
    import jax.numpy as jnp

    def chained(frames, prev_all, delta, fill, lo, hi):
        # prev_all is the previous chunk's [K, 2] positions; only full chunks
        # are ever followed by another chunk (short == EOF), so [-1] is valid
        return scan_bounded(frames, (prev_all[-1] + delta).astype(jnp.int32), fill, lo, hi)

    return jax.jit(chained)


def make_chained_batch(scan_bounded_batch):
    """Batched analog of :func:`make_chained`: ``prev_all`` is ``[B, K, 2]``,
    ``delta`` is ``[B, 2]``."""
    import jax
    import jax.numpy as jnp

    def chained(frames, prev_all, delta, fills, lo, hi):
        return scan_bounded_batch(
            frames, (prev_all[:, -1] + delta).astype(jnp.int32), fills, lo, hi
        )

    return jax.jit(chained)


def _engine_cache_path() -> str:
    import os

    d = os.environ.get("PAWSOMETRACKER_CACHE", os.path.expanduser("~/.cache/pawsometracker_tpu"))
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "engine_cache.json")


def _load_engine_cache() -> dict:
    import json
    import os

    p = _engine_cache_path()
    if os.path.exists(p):
        try:
            with open(p) as f:
                return json.load(f)
        except Exception:
            return {}
    return {}


def _save_engine_cache(cache: dict) -> None:
    import json
    import os

    p = _engine_cache_path()
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cache, f, indent=1)
    os.replace(tmp, p)


#: in-process engine decisions (also holds transient-failure fallbacks that
#: must not be persisted but should not be re-attempted every call either)
_session_engine_cache: dict = {}


def pick_bounded_engine(roi_spec, k_frames: int, fill: int = 128):
    """Measured choice between the fused Pallas bounded kernel and the XLA
    bounded scan for this environment + geometry (VERDICT: the production
    engine is chosen by measurement, not by flag). The decision is persisted
    per (device kind, jax version, geometry) so each environment measures
    once; the measurement also ASSERTS the two engines produce identical
    positions — a hardware parity pin for the compiled Pallas kernel.

    Returns ``("pallas"|"xla", info_dict)``.
    """
    return _pick_engine_measured(roi_spec, k_frames, fill, batch=None)


def pick_bounded_engine_batch(roi_spec, k_frames: int, batch: int, fill: int = 128):
    """Batched analog of :func:`pick_bounded_engine` for the batch/multi ROI
    paths: measures the ``grid=(B, T)`` fused Pallas kernel against the
    vmapped XLA bounded scan at this exact ``(geometry, K, B)`` and persists
    the decision. Parity over the whole batch is asserted before pallas can
    win."""
    return _pick_engine_measured(roi_spec, k_frames, fill, batch=int(batch))


def _pick_engine_measured(roi_spec, k_frames: int, fill: int, batch: int | None):
    import time

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return "xla", {"reason": "non-tpu backend"}
    # fill is NOT part of the key: the zero-sum DoG response is invariant to
    # the constant background level, so the timing/parity measurement is too
    key = "|".join(
        map(
            str,
            (
                "v3",  # decision-rule version (hysteresis)
                jax.devices()[0].device_kind,
                jax.__version__,
                roi_spec.frame_shape,
                roi_spec.radii,
                round(roi_spec.sigma, 6),
                roi_spec.darker_target,
                k_frames,
            )
            + (() if batch is None else (f"B{batch}",)),
        )
    )
    if key in _session_engine_cache:
        info = _session_engine_cache[key]
        return info["engine"], info
    cache = _load_engine_cache()
    if key in cache:
        _session_engine_cache[key] = cache[key]
        return cache[key]["engine"], cache[key]

    from .ops.pallas_tracker import pallas_scan_fn

    if batch is None:
        base = tracker_fns(roi_spec).scan_bounded
    else:
        base_1 = tracker_fns(roi_spec).scan_bounded
        base = jax.jit(jax.vmap(getattr(base_1, "__wrapped__", base_1)))
    ch, cw = roi_spec.frame_shape
    # realistic measurement input: a blob the size the filter is matched to
    # (a tiny or flat pattern gives a near-tie response plateau where 1-ulp
    # float differences between engines legitimately flip the argmax)
    yy, xx = np.mgrid[:ch, :cw]
    bi, bj = ch // 2 + 3, cw // 2 - 2
    sig = max(roi_spec.sigma, 1.0)
    blob = np.exp(-((yy - bi) ** 2 + (xx - bj) ** 2) / (2.0 * sig**2))
    sign = -1.0 if roi_spec.darker_target else 1.0
    frame = np.clip(fill + sign * 110.0 * blob, 0, 255).astype(np.uint8)
    if batch is None:
        crops = np.broadcast_to(frame, (k_frames, ch, cw)).copy()
        pos = jnp.asarray(np.array([ch // 2, cw // 2], np.int32))
        lo = np.zeros(2, np.int32)
        hi = np.array([ch - 1, cw - 1], np.int32)
        f = np.uint8(fill)
    else:
        crops = np.broadcast_to(frame, (batch, k_frames, ch, cw)).copy()
        pos = jnp.asarray(np.tile(np.array([[ch // 2, cw // 2]], np.int32), (batch, 1)))
        lo = np.zeros((batch, 2), np.int32)
        hi = np.tile(np.array([[ch - 1, cw - 1]], np.int32), (batch, 1))
        f = jnp.full((batch,), fill, jnp.uint8)

    def run(fn, reps=3):
        out = fn(crops, pos, f, lo, hi)
        jax.block_until_ready(out)  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(crops, pos, f, lo, hi)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return np.asarray(out), best

    try:
        pal = pallas_scan_fn(roi_spec, bounded=True, batched=batch is not None)
        out_p, t_p = run(pal)
        out_x, t_x = run(base)
        if not np.array_equal(out_p, out_x):
            # fail SAFE in production: keep the XLA engine and record the
            # mismatch; the hardware test suite asserts parity is True
            info = {
                "engine": "xla",
                "parity": False,
                "mismatch": [out_p[-1].tolist(), out_x[-1].tolist()],
            }
        else:
            # hysteresis: the fused kernel must win decisively. XLA's float
            # reduction order matches the CPU-verified oracle path on response
            # ties (cross-engine ties can flip the argmax by 1 px), so a
            # within-noise pallas win isn't worth trading tie stability for.
            info = {
                "engine": "pallas" if t_p < 0.75 * t_x else "xla",
                "pallas_ms": round(t_p * 1e3, 3),
                "xla_ms": round(t_x * 1e3, 3),
                "parity": True,
            }
    except Exception as e:  # pallas unavailable/failed to compile: use XLA
        # possibly transient (a remote-compile wedge, OOM): remember for THIS
        # process so every track() doesn't re-pay the failed attempt, but do
        # NOT persist — the next process re-measures instead of being pinned
        info = {"engine": "xla", "reason": f"pallas failed: {e}"[:200]}
        _session_engine_cache[key] = info
        return "xla", info
    _session_engine_cache[key] = info
    # a decision timed during a WEDGED link (remote-attached TPUs stall for
    # minutes at a time) is noise — keep it for this process but don't pin
    # the environment to it; the next process re-measures in a better phase
    if min(info.get("pallas_ms", 0.0), info.get("xla_ms", 0.0)) > 500.0:
        info["transient"] = "degraded-link measurement, not persisted"
        return info["engine"], info
    cache[key] = info
    try:
        _save_engine_cache(cache)
    except Exception:
        pass
    return info["engine"], info


def _select_batched_bounded(tracker, roi_spec, k_frames: int, batch: int, fill: int, engine: str):
    """The batched bounded scan for the batch/multi ROI paths: the measured
    pallas/xla choice (``auto``, which fails safe to XLA when pallas is
    unavailable), or the named engine (an explicit ``"pallas"`` raises if the
    kernel cannot build — same contract as the single-video ``engine=``)."""
    if engine == "auto":
        engine, _ = pick_bounded_engine_batch(roi_spec, k_frames, batch, fill)
    if engine == "pallas":
        from .ops.pallas_tracker import pallas_scan_fn

        return pallas_scan_fn(roi_spec, batched=True, bounded=True)
    return tracker.scan_bounded


def _crop_with_fill(frame: np.ndarray, o, ch: int, cw: int, fill: int, out=None) -> np.ndarray:
    """Crop ``frame`` at origin ``o`` (may be out of bounds) to ``(ch, cw)``,
    filling out-of-frame cells with the mode fill value."""
    H, W = frame.shape
    if out is None:
        out = np.empty((ch, cw), np.uint8)
    out.fill(fill)
    r0, c0 = max(0, o[0]), max(0, o[1])
    r1, c1 = min(H, o[0] + ch), min(W, o[1] + cw)
    if r1 > r0 and c1 > c0:
        out[r0 - o[0] : r1 - o[0], c0 - o[1] : c1 - o[1]] = frame[r0:r1, c0:c1]
    return out


def _to_host_async(*arrays):
    """Start device->host transfers early so the lagged drain doesn't block."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except Exception:
            pass


def run_roi_pipeline(
    src,
    spec,
    pos0_abs: np.ndarray,
    fill: int,
    n_rest: int,
    *,
    roi_frames: int,
    depth: int,
    engine: str,
    subpixel: bool,
    dia,
    timer,
    native_roi: bool,
    prefetchers: list,
    speculate: str = "predict",
):
    """Track ``n_rest`` frames of ``src`` by pipelined ROI streaming.

    Returns ``(position_arrays, offset_arrays, frames_tracked)`` where each
    array in ``position_arrays`` is an absolute int ``[k, 2]`` block.
    ``prefetchers`` collects any ChunkPrefetcher created here so the caller's
    ``finally`` can join its thread before closing ``src``.

    ``depth="auto"`` adapts at runtime: start at 1 and deepen (up to
    :data:`AUTO_DEPTH_MAX`) whenever the lagged drain still blocks — i.e. the
    measured per-chunk drain latency says the pipeline isn't hiding the
    round trip yet — and reset to 1 on a mispredict replay (extrapolation is
    unreliable for this motion, so a long speculation horizon only buys
    replays). Results are identical at every depth; since the predict-mode
    crop geometry is depth-independent, adapting costs no bytes and no
    recompiles.
    """
    import time

    import jax.numpy as jnp

    H, W = spec.frame_shape
    K = roi_frames
    auto_depth = depth == "auto"
    depth_max = AUTO_DEPTH_MAX if auto_depth else depth
    depth_cur = 1 if auto_depth else depth
    depth = depth_max  # geometry/ring/buffer sizing below uses the max
    mode = speculate if depth > 0 else "contain"
    ch, cw, margin = roi_geometry(spec, K, depth, mode)
    roi_spec = make_spec((ch, cw), spec.window_size, spec.target_width, spec.darker_target)
    base = tracker_fns(roi_spec)
    if engine == "auto" and not subpixel:
        # measured per-environment choice, persisted; also a hardware parity
        # pin (the measurement asserts pallas == xla positions on this chip)
        engine, _ = pick_bounded_engine(roi_spec, K, fill)
    if subpixel:
        scan_first, scan_chain = base.scan_sub, make_chained(base.scan_sub)
    elif engine == "pallas":
        from .ops.pallas_tracker import pallas_scan_fn

        pal = pallas_scan_fn(roi_spec, bounded=True)
        scan_first, scan_chain = pal, make_chained(pal)
    else:
        scan_first, scan_chain = base.scan_bounded, make_chained(base.scan_bounded)

    fill_dev = np.uint8(fill)
    rh = np.array(spec.radii) + spec.kernel_len // 2  # window + apron half-extent
    # rotating crop buffers: a buffer is reused only after its chunk's result
    # is drained, so an in-flight device transfer never reads a mutated buffer
    free_bufs = [np.empty((K, ch, cw), np.uint8) for _ in range(depth + 2)]

    positions: list[np.ndarray] = []
    offsets: list[np.ndarray] = []
    tracked = 0
    P_abs = np.asarray(pos0_abs, np.int64)  # newest DOWNLOADED position
    vel = np.zeros(2)  # px/frame, from the last accepted chunk (predict mode)
    prev_out = None  # device handle: previous chunk's positions [K, 2]
    prev_origin = None
    pending: deque = deque()  # (out, off, origin, k, frames_for_dia, buf)

    def bounds_for(origin):
        lo = np.maximum([-origin[0], -origin[1]], 0).astype(np.int32)
        hi = np.minimum([ch - 1, cw - 1], [H - 1 - origin[0], W - 1 - origin[1]]).astype(
            np.int32
        )
        return lo, hi

    def dispatch(buf, k, origin):
        nonlocal prev_out, prev_origin
        lo, hi = bounds_for(origin)
        with timer.section("device"):
            if prev_out is None:
                pos_rel = jnp.asarray((P_abs - origin).astype(np.int32))
                out = scan_first(buf, pos_rel, fill_dev, lo, hi)
            else:
                delta = (prev_origin - origin).astype(np.int32)
                out = scan_chain(buf, prev_out, delta, fill_dev, lo, hi)
        if subpixel:
            out, off = out
            _to_host_async(out, off)
        else:
            off = None
            _to_host_async(out)
        prev_out, prev_origin = out, origin
        return out, off

    def contained(seq_abs, origin):
        """True iff every window the scan read around ``seq_abs`` positions
        lies inside the crop (reads past the TRUE frame edge hit the same
        mode-fill in both the crop scan and a full-frame scan)."""
        lo_ok = np.maximum(seq_abs - rh, 0) >= origin
        hi_ok = np.minimum(seq_abs + rh, np.array([H - 1, W - 1])) <= origin + np.array(
            [ch - 1, cw - 1]
        )
        return bool(lo_ok.all() and hi_ok.all())

    RETAINED = "native-retained"  # frames live in the C++ ring, not Python

    def accept(out_np, off, origin, k, frames, buf):
        nonlocal P_abs, tracked, vel
        valid = out_np[:k].astype(np.int64) + origin
        positions.append(valid)
        if off is not None:
            offsets.append(np.asarray(off)[:k])
        if frames is RETAINED:
            src.release(k)  # this chunk's frames are the oldest retained
        elif frames is not None:
            with timer.section("diagnose"):
                for i in range(k):
                    dia(frames[i], valid[i])
            recycle(frames)
        if k > 1:
            vel = (valid[-1] - valid[0]) / (k - 1)
        P_abs = valid[-1]
        tracked += k
        if buf is not None:
            free_bufs.append(buf)

    def replay(entries):
        """Mispredict: every entry (oldest first) is re-cropped from retained
        frames at its EXACT origin and re-run synchronously. The exact origin
        plus the predict margin (>= K*r + L//2) restores the synchronous
        containment guarantee, so a replayed chunk is always valid."""
        nonlocal prev_out, prev_origin, depth_cur
        global replay_count
        replay_count += 1
        if auto_depth:
            depth_cur = 1  # long speculation horizons don't pay for this motion
        prev_out = None  # the device chain past this point is invalid
        prev_origin = None
        for _, off_ignored, _, k, frames, buf in entries:
            origin = np.array([P_abs[0] - margin[0], P_abs[1] - margin[1]], np.int64)
            rbuf = np.empty((K, ch, cw), np.uint8)
            with timer.section("crop"):
                if frames is RETAINED:
                    # each accept released its chunk, so this entry's frames
                    # are now the OLDEST retained: recrop window [0, k)
                    src.recrop(0, k, origin, ch, cw, fill, out=rbuf)
                else:
                    for i in range(k):
                        _crop_with_fill(frames[i], origin, ch, cw, fill, out=rbuf[i])
                for i in range(k, K):
                    rbuf[i] = rbuf[k - 1]
            out, off = dispatch(rbuf, k, origin)
            with timer.section("drain"):
                out_np = np.asarray(out)
            accept(out_np, off, origin, k, frames, buf)

    def drain_one():
        nonlocal depth_cur
        out, off, origin, k, frames, buf = pending.popleft()
        with timer.section("drain"):
            t0 = time.perf_counter()
            out_np = np.asarray(out)
            blocked = time.perf_counter() - t0
        if auto_depth and blocked > AUTO_DRAIN_BLOCK_S and depth_cur < depth_max:
            # the lagged download still blocked: the pipeline isn't deep
            # enough to hide the round trip — add a chunk of slack
            depth_cur += 1
        if mode == "predict":
            seq = np.concatenate(
                [P_abs[None], out_np[:k].astype(np.int64) + origin], axis=0
            )
            if not contained(seq, origin):
                replay([(out, off, origin, k, frames, buf)] + list(pending))
                pending.clear()
                return
        accept(out_np, off, origin, k, frames, buf)

    # frame delivery: with the native decoder and diagnostics off, crops are
    # cut in C++ straight from the decode ring — full frames never enter
    # Python. In predict mode the ring RETAINS each chunk's frames until its
    # result is validated, so mispredict replays recrop in C++ too.
    use_native_roi = native_roi and mode == "contain"
    # retained reads DEADLOCK if the ring cannot hold the in-flight chunks
    # plus one decoding chunk, so require a ring sized by the caller
    use_native_retained = (
        native_roi
        and mode == "predict"
        and hasattr(src, "read_roi_chunk_retained")
        and getattr(src, "ring_frames", 0) >= (depth + 2) * K
    )

    def recycle(frames):
        if roi_prefetch is not None and frames is not None and frames is not RETAINED:
            roi_prefetch.recycle(frames)

    roi_prefetch = None
    if use_native_roi or use_native_retained:
        remaining = n_rest
        while remaining > 0:
            while len(pending) > depth_cur:
                drain_one()
            if mode == "predict":
                stale = sum(e[3] for e in pending)
                pred = P_abs + vel * stale
                origin = np.round(pred).astype(np.int64) - np.asarray(margin)
            else:
                origin = np.array([P_abs[0] - margin[0], P_abs[1] - margin[1]], np.int64)
            buf = free_bufs.pop()
            with timer.section("crop"):
                reader = src.read_roi_chunk_retained if use_native_retained else src.read_roi_chunk
                got = reader(
                    min(K, remaining), (int(origin[0]), int(origin[1])), ch, cw, fill, out=buf
                )
            k = got.shape[0]
            if k == 0:
                free_bufs.append(buf)
                break
            for i in range(k, K):
                buf[i] = buf[k - 1]
            out, off = dispatch(buf, k, origin)
            pending.append((out, off, origin, k, RETAINED if use_native_retained else None, buf))
            remaining -= k
    else:
        from .diagnose import Dont

        keep_for_dia = not isinstance(dia, Dont)
        roi_prefetch = ChunkPrefetcher(src, K, max_frames=n_rest)
        prefetchers.append(roi_prefetch)
        for chunk in roi_prefetch:
            while len(pending) > depth_cur:
                drain_one()
            k = chunk.shape[0]
            if mode == "predict":
                # extrapolate to the chunk's incoming position: P_abs is
                # sum(pending ks) frames stale relative to it
                stale = sum(e[3] for e in pending)
                pred = P_abs + vel * stale
                origin = np.round(pred).astype(np.int64) - np.asarray(margin)
            else:
                origin = np.array([P_abs[0] - margin[0], P_abs[1] - margin[1]], np.int64)
            buf = free_bufs.pop()
            with timer.section("crop"):
                for i in range(k):
                    _crop_with_fill(chunk[i], origin, ch, cw, fill, out=buf[i])
            for i in range(k, K):
                buf[i] = buf[k - 1]
            out, off = dispatch(buf, k, origin)
            retain = mode == "predict" or keep_for_dia
            if not retain:
                roi_prefetch.recycle(chunk)
                chunk = None
            pending.append((out, off, origin, k, chunk, buf))

    while pending:
        drain_one()
    return positions, offsets, tracked


def make_chained_full(scan):
    """Chained wrapper for FULL-FRAME scans ``fn(frames, pos0, fill)``."""
    import jax
    import jax.numpy as jnp

    def chained(frames, prev_all, fill):
        return scan(frames, prev_all[-1].astype(jnp.int32), fill)

    return jax.jit(chained)


def run_full_pipeline(
    src,
    spec,
    pos0_abs: np.ndarray,
    fill: int,
    n_rest: int,
    *,
    chunk_size: int,
    depth: int,
    scan,
    subpixel: bool,
    dia,
    timer,
    prefetchers: list,
):
    """Full-frame streaming with the same de-serialization as the ROI path:
    chunk scans chain their start positions on device and the host downloads
    positions ``depth`` chunks behind (no origins, no speculation — frames are
    whole, so results are trivially identical to the synchronous loop)."""
    import jax.numpy as jnp

    scan_chain = make_chained_full(scan)
    fill_dev = np.uint8(fill)
    positions: list[np.ndarray] = []
    offsets: list[np.ndarray] = []
    tracked = 0
    prev_out = None
    pending: deque = deque()  # (out, off, k, frames_for_dia)

    from .diagnose import Dont

    keep = not isinstance(dia, Dont)

    def drain_one():
        nonlocal tracked
        out, off, k, frames = pending.popleft()
        with timer.section("drain"):
            out_np = np.asarray(out)
        positions.append(out_np[:k])
        if off is not None:
            offsets.append(np.asarray(off)[:k])
        if keep:
            with timer.section("diagnose"):
                for i in range(k):
                    dia(frames[i], out_np[i])
        # recycle only at drain: the device transfer from this buffer is done
        # once its result materialized, so the producer may refill it now
        prefetch.recycle(frames)
        tracked += k

    prefetch = ChunkPrefetcher(src, chunk_size, max_frames=n_rest)
    prefetchers.append(prefetch)
    pos0 = jnp.asarray(np.asarray(pos0_abs, np.int32))
    for chunk in prefetch:
        while len(pending) > depth:
            drain_one()
        k = chunk.shape[0]
        if k < chunk_size:
            pad = np.repeat(chunk[-1:], chunk_size - k, axis=0)
            chunk_in = np.concatenate([chunk, pad], axis=0)
        else:
            chunk_in = chunk
        with timer.section("device"):
            if prev_out is None:
                out = scan(chunk_in, pos0, fill_dev)
            else:
                out = scan_chain(chunk_in, prev_out, fill_dev)
        if subpixel:
            out, off = out
            _to_host_async(out, off)
        else:
            off = None
            _to_host_async(out)
        prev_out = out
        pending.append((out, off, k, chunk))
    while pending:
        drain_one()
    return positions, offsets, tracked


def run_multi_roi_pipeline(
    src,
    spec,
    pos0_abs: np.ndarray,
    fill: int,
    n_rest: int,
    *,
    roi_frames: int,
    depth: int,
    timer,
    prefetchers: list,
    engine: str = "auto",
    subpixel: bool = False,
):
    """Speculative pipelined ROI streaming for N targets in ONE stream: each
    decoded frame yields N drift-bounded crops (bounded scans batched over the
    target axis), aimed per target by velocity prediction and validated /
    replayed exactly like the single-target pipeline. With the native decoder
    the first target's crop comes from the retained read and the other N-1
    from C++ ``recrop`` — full frames never enter Python.

    ``engine="auto"`` makes the measured pallas/xla choice for the batched
    bounded scan (grid ``(N, K)`` fused kernel vs vmapped XLA); ``subpixel``
    forces the XLA sub-pixel scan and additionally returns offset arrays.

    Returns ``(position_arrays, offset_arrays, frames_tracked)``; each
    position array is ``[k, N, 2]`` absolute int (offsets ``[k, N, 2]``
    float, empty list unless ``subpixel``).
    """
    import time

    import jax.numpy as jnp

    from .parallel.mesh import ShardedBatchTracker

    H, W = spec.frame_shape
    K = roi_frames
    auto_depth = depth == "auto"
    depth_max = AUTO_DEPTH_MAX if auto_depth else depth
    depth_cur = 1 if auto_depth else depth
    depth = depth_max  # geometry/ring/buffer sizing uses the cap
    mode = "predict" if depth > 0 else "contain"
    ch, cw, margin = roi_geometry(spec, K, depth, mode)
    roi_spec = make_spec((ch, cw), spec.window_size, spec.target_width, spec.darker_target)
    N = int(pos0_abs.shape[0])
    tracker = ShardedBatchTracker(roi_spec, None)
    if subpixel:
        scan_bounded = tracker.scan_sub  # XLA only (needs the response peak)
    else:
        scan_bounded = _select_batched_bounded(tracker, roi_spec, K, N, fill, engine)
    scan_chain = make_chained_batch(scan_bounded)
    fills_vec = jnp.asarray(np.full(N, fill, np.uint8))
    rh = np.array(spec.radii) + spec.kernel_len // 2
    frame_max = np.array([H - 1, W - 1])
    free_bufs = [np.empty((N, K, ch, cw), np.uint8) for _ in range(depth + 2)]

    positions: list[np.ndarray] = []
    offsets: list[np.ndarray] = []
    tracked = 0
    P = np.asarray(pos0_abs, np.int64)  # [N, 2] newest downloaded
    vel = np.zeros((N, 2))
    prev_out = None
    prev_origins = None
    pending: deque = deque()  # (out, off, origins [N,2], k, frames_token, buf)

    RETAINED = "native-retained"
    native = (
        hasattr(src, "read_roi_chunk_retained")
        and getattr(src, "ring_frames", 0) >= (depth + 2) * K
    )
    roi_prefetch = None if native else ChunkPrefetcher(src, K, max_frames=n_rest)
    if roi_prefetch is not None:
        prefetchers.append(roi_prefetch)

    def run_scan(buf, origins, pos0=None):
        nonlocal prev_out, prev_origins
        lo = np.maximum(-origins, 0).astype(np.int32)
        hi = np.minimum([[ch - 1, cw - 1]] * N, frame_max[None] - origins).astype(np.int32)
        with timer.section("device"):
            if pos0 is not None or prev_out is None:
                p0 = P if pos0 is None else pos0
                out = scan_bounded(
                    buf, jnp.asarray((p0 - origins).astype(np.int32)), fills_vec, lo, hi
                )
            else:
                out = scan_chain(
                    buf,
                    prev_out,
                    jnp.asarray((prev_origins - origins).astype(np.int32)),
                    fills_vec,
                    lo,
                    hi,
                )
        if subpixel:
            out, off = out
            _to_host_async(out, off)
        else:
            off = None
            _to_host_async(out)
        prev_out, prev_origins = out, origins
        return out, off

    def crop_round(frames, k, origins, buf, retained_base=None):
        """Fill buf[N, K] with per-target crops of this chunk's frames."""
        with timer.section("crop"):
            if frames is RETAINED:
                for t in range(N):
                    src.recrop(retained_base, k, origins[t], ch, cw, fill, out=buf[t])
            else:
                for t in range(N):
                    for i in range(k):
                        _crop_with_fill(frames[i], origins[t], ch, cw, fill, out=buf[t, i])
            for t in range(N):
                for i in range(k, K):
                    buf[t, i] = buf[t, k - 1]

    def accept(out_np, off, origins, k, frames, buf):
        nonlocal P, vel, tracked
        valid = out_np[:, :k].astype(np.int64) + origins[:, None, :]  # [N, k, 2]
        positions.append(np.transpose(valid, (1, 0, 2)))  # [k, N, 2]
        if off is not None:
            offsets.append(np.transpose(np.asarray(off)[:, :k], (1, 0, 2)))
        if frames is RETAINED:
            src.release(k)
        elif frames is not None:
            roi_prefetch.recycle(frames)
        if k > 1:
            vel = (valid[:, -1] - valid[:, 0]) / (k - 1)
        P = valid[:, -1]
        tracked += k
        if buf is not None:
            free_bufs.append(buf)

    def contained(out_np, origins, k):
        seq = np.concatenate(
            [P[:, None, :], out_np[:, :k].astype(np.int64) + origins[:, None, :]], axis=1
        )
        lo_ok = np.maximum(seq - rh, 0) >= origins[:, None, :]
        hi_ok = np.minimum(seq + rh, frame_max) <= (origins + [ch - 1, cw - 1])[:, None, :]
        return bool(lo_ok.all() and hi_ok.all())

    def replay(entries):
        nonlocal prev_out, prev_origins, depth_cur
        global replay_count
        replay_count += 1
        if auto_depth:
            depth_cur = 1
        prev_out = None
        prev_origins = None
        for _, _, _, k, frames, buf in entries:
            origins = P - np.asarray(margin)
            rbuf = np.empty((N, K, ch, cw), np.uint8)
            crop_round(frames, k, origins, rbuf, retained_base=0)
            out, off = run_scan(rbuf, origins, pos0=P)
            with timer.section("drain"):
                out_np = np.asarray(out)
            accept(out_np, off, origins, k, frames, buf)

    def drain_one():
        nonlocal depth_cur
        entry = pending.popleft()
        out, off, origins, k, frames, buf = entry
        with timer.section("drain"):
            t0 = time.perf_counter()
            out_np = np.asarray(out)
            blocked = time.perf_counter() - t0
        if auto_depth and blocked > AUTO_DRAIN_BLOCK_S and depth_cur < depth_max:
            depth_cur += 1
        if mode == "predict" and not contained(out_np, origins, k):
            replay([entry] + list(pending))
            pending.clear()
            return
        accept(out_np, off, origins, k, frames, buf)

    def next_chunk(remaining):
        """Returns (frames_token, k, retained_base) or (None, 0, 0) at EOF."""
        if native:
            base = sum(e[3] for e in pending)
            got = src.advance_retained(min(K, remaining))
            return (RETAINED, got, base) if got else (None, 0, 0)
        try:
            chunk = next(prefetch_iter)
        except StopIteration:
            return None, 0, 0
        return (chunk, chunk.shape[0], 0) if chunk.shape[0] else (None, 0, 0)

    prefetch_iter = iter(roi_prefetch) if roi_prefetch is not None else None
    remaining = n_rest
    while remaining > 0:
        while len(pending) > depth_cur:
            drain_one()
        frames, k, base = next_chunk(remaining)
        if k == 0:
            break
        if mode == "predict":
            stale = sum(e[3] for e in pending)
            origins = np.round(P + vel * stale).astype(np.int64) - np.asarray(margin)
        else:
            origins = P - np.asarray(margin)
        buf = free_bufs.pop()
        crop_round(frames, k, origins, buf, retained_base=base)
        out, off = run_scan(buf, origins)
        pending.append((out, off, origins, k, frames, buf))
        remaining -= k
    while pending:
        drain_one()
    return positions, offsets, tracked
