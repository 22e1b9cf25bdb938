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

**One controller, three frontends.** The dispatch/contain/replay/auto-depth
state machine exists ONCE — :class:`SpeculativePipeline`, generic over a lane
axis ``L >= 1`` — with pluggable frame delivery (:class:`SingleVideoSource`
for one video/one target, :class:`FanoutSource` for N targets in one stream,
:class:`PerVideoSource` for B independent videos) and pluggable engines
(:class:`_SingleEngine` wraps the unbatched measured kernels so the L=1 path
keeps its engine byte-for-byte; :class:`_BatchedEngine` wraps the batched /
sharded scans). ``run_roi_pipeline`` / ``run_multi_roi_pipeline`` /
``track_batch`` are thin compositions of these pieces, so a tuning or
correctness change cannot silently diverge between them.
"""

from __future__ import annotations

import functools
import logging
import os
import time
from collections import deque

import numpy as np

logger = logging.getLogger(__name__)

from .io.decode import ChunkPrefetcher
from .models.dog_tracker import make_spec, tracker_fns

__all__ = ["roi_geometry", "make_chained", "make_chained_batch", "run_roi_pipeline",
           "pick_bounded_engine", "pick_bounded_engine_batch", "SpeculativePipeline",
           "SingleVideoSource", "FanoutSource", "PerVideoSource"]

#: mispredict replays since import (observability: tests + debugging)
replay_count = 0

#: cap for pipeline_depth="auto". Deep enough that group dispatch can keep
#: TWO full groups in flight (group cap = (depth+1)//2, so depth 7 -> S=4:
#: one group executes while the next stages — without that overlap grouping
#: LOSES, measured e2e). In predict mode crop geometry is depth-independent,
#: so depth costs no bytes/frame — only retained-ring memory, bounded by
#: :func:`auto_depth_cap`.
AUTO_DEPTH_MAX = 7

#: retained-ring memory budget for pipeline_depth="auto" (MB); the auto
#: depth cap shrinks on large frames so the C++ decode ring
#: ((depth+2)*K gray8 frames) stays inside it. Override: PAWS_RING_BUDGET_MB.
RING_BUDGET_MB = 512


def auto_depth_cap(frame_shape, k_frames: int, lanes: int = 1) -> int:
    """Depth cap for ``pipeline_depth="auto"``: :data:`AUTO_DEPTH_MAX`,
    bounded so the retained decode ring ((depth+2)*K frames plus the decode
    margin) stays within :data:`RING_BUDGET_MB` for this frame size.
    ``lanes`` divides the budget between concurrent streams (track_batch
    opens one ring per video). The cap floors at depth 1 — a ring smaller
    than (1+2)*K+8 frames cannot run the pipeline at all — and warns once
    when that floor overruns the requested budget.

    Bytes/frame model: 1.5x H*W — the native ring retains REFS of the
    decoder's yuv420p frames (luma + quarter-res chroma x2) rather than
    packed gray copies (pawsio.cpp RingSlot); 4:2:2/4:4:4 content costs
    more, gray/swscale content less — 4:2:0 is the overwhelming common
    case and the budget is a soft safety bound."""
    budget = float(os.environ.get("PAWS_RING_BUDGET_MB", RING_BUDGET_MB)) * 1e6
    fb = 1.5 * max(float(frame_shape[0]) * float(frame_shape[1]), 1.0) * max(lanes, 1)
    frames = int(budget // fb)
    cap = min(AUTO_DEPTH_MAX, (frames - 8) // max(k_frames, 1) - 2)
    if cap < 1:
        _warn_ring_budget(round(budget / 1e6), lanes, frame_shape[1],
                          frame_shape[0], round((3 * k_frames + 8) * fb / 1e6))
        return 1
    return cap


@functools.lru_cache(maxsize=64)
def _warn_ring_budget(budget_mb, lanes, w, h, need_mb) -> None:
    """One-time (per configuration) warning that the depth-1 floor overruns
    the requested ring budget."""
    logger.warning(
        "PAWS_RING_BUDGET_MB=%s cannot hold the minimum decode ring for "
        "%d lane(s) of %dx%d frames (need ~%s MB); running at depth 1 "
        "beyond the budget", budget_mb, lanes, w, h, need_mb,
    )

#: pipeline_depth="auto" deepens when the lagged drain blocks longer than
#: this — one constant because there is one drain controller
AUTO_DRAIN_BLOCK_S = 0.002

#: sentinel: a chunk's frames live in the native decoder's C++ retained ring
RETAINED = "native-retained"


def _predict_slack(k_frames: int, depth: int, r: int) -> int:
    """Per-axis prediction-error budget (px) on top of the window+kernel
    apron in predict mode — the ONLY margin term, since per-frame crop
    origins ride the predicted path (the old chunk-level aim needed the
    worst-case in-chunk drift ``K*r`` on top: 176 of the ~230 px margin at
    defaults, 4-5x the staged H2D bytes, which on a 1-core host came
    straight out of the decode budget — docs/performance.md).

    Deliberately depth-INDEPENDENT: depth is then a pure latency-hiding knob —
    crop geometry (bytes/frame, jitted kernels, engine-cache entries) is
    identical at every depth, and a deeper pipeline costs nothing per frame.
    The price of the budget being finite is mispredict replays (prediction
    error grows with the staleness horizon); correctness never depends on it
    (containment validation replays exactly, and a failed exact-origin
    rewind SPLITS until its 1-frame floor, which is provably contained).
    ``PAWS_PREDICT_SLACK`` overrides (px)."""
    env = os.environ.get("PAWS_PREDICT_SLACK")
    if env:
        return max(1, int(env))
    return max(24, 2 * r, k_frames)


def roi_geometry(spec, k_frames: int, depth: int = 0, mode: str = "contain"):
    """``(crop_h, crop_w, margin)`` for K-frame ROI mini-scans at pipeline
    ``depth`` (chunks the host may run ahead of the device).

    predict mode: per-frame origins (see :meth:`SpeculativePipeline._aim`)
    put each frame's expected window center at its crop's center, so the
    margin is window radius + kernel apron + a prediction-error slack.
    contain mode: one origin per chunk at the last KNOWN position, margin =
    worst-case drift over the full (depth+1)*K horizon — no speculation, no
    replays, bigger crops."""
    ri, rj = spec.radii
    half = spec.kernel_len // 2
    if mode == "predict":
        mi = ri + half + _predict_slack(k_frames, depth, ri)
        mj = rj + half + _predict_slack(k_frames, depth, rj)
    else:
        mi = (depth + 1) * k_frames * ri + half
        mj = (depth + 1) * k_frames * rj + half
    return 2 * mi + 1, 2 * mj + 1, (mi, mj)


@functools.lru_cache(maxsize=256)
def make_chained(scan_bounded):
    """Wrap a bounded scan ``fn(frames, pos0, fill, deltas, lo, hi)`` so the
    start position is computed ON DEVICE from the previous chunk's (lazy)
    final position — the link that lets consecutive chunk scans dispatch
    without a host round-trip. The chunk-to-chunk origin shift rides
    ``deltas[0]`` (prev chunk's LAST frame origin minus this chunk's first),
    so no extra argument is needed.

    Memoized on the scan function object: the scan factories are themselves
    lru-cached per spec, so without this every ``track()`` call built a fresh
    ``jax.jit`` wrapper and paid a ~0.6 s XLA recompile of the chained
    dispatch inside the streaming loop (profiled on the v5e tunnel)."""
    import jax
    import jax.numpy as jnp

    def chained(frames, prev_all, prev_k, fill, deltas, lo, hi):
        # prev_all is the previous chunk's [K, 2] positions, prev_k its VALID
        # frame count: short chunks (velocity probes, split rewind halves,
        # per-lane EOF) are followed by more chunks, and their pad rows carry
        # garbage under per-frame origins — chain from the last REAL row
        p = prev_all[jnp.maximum(prev_k - 1, 0)]
        return scan_bounded(frames, p.astype(jnp.int32), fill, deltas, lo, hi)

    return jax.jit(chained)


@functools.lru_cache(maxsize=256)
def make_super_chain(scan_bounded, S: int, subpixel: bool):
    """One jitted program that runs ``S`` consecutive bounded chunk scans,
    chaining positions on device (``pos0(s) = out(s-1)[-1] + delta(s)``).

    On a remote-attached TPU every jit call is a tunnel RPC; coalescing S
    per-chunk dispatches into one program + one result fetch cuts the
    per-chunk round-trip overhead ~S× (measured 1.4-1.7× e2e on the v5e
    tunnel at S=4..8 with realistic decode gaps). The body is the SAME inner
    scan the per-chunk path jits, composed the same way as
    :func:`make_chained`, so positions are bit-identical — and the
    containment validation + replay machinery never depends on dispatch
    shape anyway."""
    import jax
    import jax.numpy as jnp

    inner = getattr(scan_bounded, "__wrapped__", scan_bounded)

    def sup(crops, prev_all, prev_k, ks, deltas, fill, los, his):
        # prev_k / ks[s]: valid frame counts of the pre-group chunk and of
        # each group member — chain from the last REAL row (see make_chained)
        outs = []
        p = prev_all[jnp.maximum(prev_k - 1, 0)]
        for s in range(S):
            out = inner(crops[s], p.astype(jnp.int32), fill, deltas[s],
                        los[s], his[s])
            outs.append(out)
            last = jnp.maximum(ks[s] - 1, 0)
            p = out[0][last] if subpixel else out[last]
        return outs

    return jax.jit(sup)


class _GroupHandle:
    """Per-chunk result handle for group dispatch: resolves to one slot of
    the group task's result list once the group is flushed."""

    __slots__ = ("fut", "idx")

    def __init__(self):
        self.fut = None
        self.idx = 0

    def result(self):
        return self.fut.result()[self.idx]


@functools.lru_cache(maxsize=256)
def make_chained_batch(scan_bounded_batch):
    """Batched analog of :func:`make_chained` (same memoization rationale) —
    except the chain state is an ABSOLUTE per-lane carry ``[B, 2]`` int32,
    not the previous chunk's output rows. A chunk can hold ZERO valid frames
    for one lane mid-stream (split-rewind remainders, a short lane past its
    EOF while longer lanes continue): that lane's scan rows are argmaxes
    over fill-padding — garbage a row-indexed chain would propagate into the
    lane's NEXT real chunk. The carry instead pins such lanes at their last
    real position: ``carry' = ks > 0 ? pos[ks-1] + origin_last : carry``.
    Frame/chunk origins enter as arrays so the rebase (absolute -> frame-0
    crop coordinates) and the carry update run inside the one jitted
    program; ``deltas[:, 0]`` is zero in this scheme (the chunk-to-chunk
    shift is the ``carry - origin0`` rebase, not a delta row).

    Returns ``(scan_out, new_carry)``."""
    import jax
    import jax.numpy as jnp

    def chained(frames, carry, ks, origin0, origin_last, fills, deltas, lo, hi):
        p = (carry - origin0).astype(jnp.int32)
        out = scan_bounded_batch(frames, p, fills, deltas, lo, hi)
        pos = out[0] if isinstance(out, tuple) else out
        idx = jnp.maximum(ks - 1, 0)[:, None, None]  # [B, 1, 1]
        last = jnp.take_along_axis(pos, idx, axis=1)[:, 0]
        carry2 = jnp.where(
            (ks > 0)[:, None], last.astype(jnp.int32) + origin_last, carry
        )
        return out, carry2

    return jax.jit(chained)


@functools.lru_cache(maxsize=256)
def make_super_chain_batch(scan_bounded_batch, S: int, subpixel: bool):
    """Batched analog of :func:`make_super_chain`: S chained batched chunk
    scans in one jitted program, threading the absolute per-lane carry of
    :func:`make_chained_batch` through the group. ``crops`` is a tuple of S
    ``[L, K, ch, cw]`` arrays; ``kss``/``origin0s``/``origin_lasts`` are
    ``[S, L]`` / ``[S, L, 2]``; ``deltas``/``los``/``his`` are
    ``[S, L, K, 2]``. Returns ``(outs, new_carry)``."""
    import jax
    import jax.numpy as jnp

    inner = getattr(scan_bounded_batch, "__wrapped__", scan_bounded_batch)

    def sup(crops, carry, kss, origin0s, origin_lasts, deltas, fills, los, his):
        outs = []
        for s in range(S):
            p = (carry - origin0s[s]).astype(jnp.int32)
            out = inner(crops[s], p, fills, deltas[s], los[s], his[s])
            outs.append(out)
            pos = out[0] if subpixel else out
            idx = jnp.maximum(kss[s] - 1, 0)[:, None, None]
            last = jnp.take_along_axis(pos, idx, axis=1)[:, 0]
            carry = jnp.where(
                (kss[s] > 0)[:, None],
                last.astype(jnp.int32) + origin_lasts[s],
                carry,
            )
        return outs, carry

    return jax.jit(sup)


def _engine_cache_path() -> str:
    d = os.environ.get("PAWSOMETRACKER_CACHE", os.path.expanduser("~/.cache/pawsometracker_tpu"))
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "engine_cache.json")


def _load_engine_cache() -> dict:
    import json

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

    p = _engine_cache_path()
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cache, f, indent=1)
    os.replace(tmp, p)


#: in-process engine decisions (also holds transient-failure fallbacks that
#: must not be persisted but should not be re-attempted every call either)
_session_engine_cache: dict = {}


def pick_bounded_engine(roi_spec, k_frames: int, fill: int = 128, subpixel: bool = False):
    """Measured choice between the fused Pallas bounded kernel and the XLA
    bounded scan for this environment + geometry (VERDICT: the production
    engine is chosen by measurement, not by flag). The decision is persisted
    per (device kind, jax version, geometry) so each environment measures
    once; the measurement also ASSERTS the two engines produce identical
    positions — a hardware parity pin for the compiled Pallas kernel — and
    additionally runs argmax-TIE geometries (flat field, mirror-symmetric
    blob): any cross-engine tie divergence is recorded (``tie_parity``) and
    pins the environment to XLA, whose reduction order matches the
    CPU-verified oracle path (reference ``findmax`` first-max tie-break:
    src/PawsomeTracker.jl:59).

    ``subpixel=True`` measures the fused bounded+subpixel kernel against the
    XLA ``scan_sub``: positions must match exactly and the parabolic offsets
    to float tolerance before pallas can win.

    Returns ``("pallas"|"xla", info_dict)``.
    """
    return _pick_engine_measured(roi_spec, k_frames, fill, batch=None, subpixel=subpixel)


def pick_bounded_engine_batch(roi_spec, k_frames: int, batch: int, fill: int = 128,
                              subpixel: bool = False):
    """Batched analog of :func:`pick_bounded_engine` for the batch/multi ROI
    paths: measures the ``grid=(B, T)`` fused Pallas kernel against the
    vmapped XLA bounded scan at this exact ``(geometry, K, B)`` and persists
    the decision. Parity over the whole batch is asserted before pallas can
    win."""
    return _pick_engine_measured(roi_spec, k_frames, fill, batch=int(batch),
                                 subpixel=subpixel)


def _pick_engine_measured(roi_spec, k_frames: int, fill: int, batch: int | None,
                          subpixel: bool = False):
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
                "v7",  # decision-rule version (v4: banded-matmul XLA path;
                       # v5: probe times device-staged inputs, not H2D;
                       # v6: per-frame crop origins — new scan signature;
                       # v7: tie-stress parity gate — pallas must match XLA
                       # on argmax-tie geometries before it can win)
                jax.devices()[0].device_kind,
                jax.__version__,
                roi_spec.frame_shape,
                roi_spec.radii,
                round(roi_spec.sigma, 6),
                roi_spec.darker_target,
                k_frames,
            )
            + (() if batch is None else (f"B{batch}",))
            + (("sub",) if subpixel else ()),
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

    base_1 = tracker_fns(roi_spec).scan_sub if subpixel else tracker_fns(roi_spec).scan_bounded
    if batch is None:
        base = base_1
    else:
        base = jax.jit(jax.vmap(getattr(base_1, "__wrapped__", base_1)))
    ch, cw = roi_spec.frame_shape
    # realistic measurement input: a blob the size the filter is matched to,
    # deliberately OFF-center/asymmetric so the argmax is unique (the timing
    # + baseline parity measurement must not hinge on tie-break order)
    yy, xx = np.mgrid[:ch, :cw]
    bi, bj = ch // 2 + 3, cw // 2 - 2
    sig = max(roi_spec.sigma, 1.0)
    sign = -1.0 if roi_spec.darker_target else 1.0

    def _blob_frame(ci, cj):
        blob = np.exp(-((yy - ci) ** 2 + (xx - cj) ** 2) / (2.0 * sig**2))
        return np.clip(fill + sign * 110.0 * blob, 0, 255).astype(np.uint8)

    frame = _blob_frame(bi, bj)
    # tie-stress inputs: geometries where the DoG response has exact ties,
    # so the argmax depends on each engine's reduction order. Real clips DO
    # reach these (BENCH_r02 recorded 0.091 px of pallas tie variance on a
    # symmetric synthetic target that the old asymmetric-only probe never
    # tested — VERDICT r3 weak #5): a flat field (response 0 everywhere —
    # the whole window ties) and a mirror-symmetric centered blob (mirror
    # positions tie to the last ulp).
    tie_frames = [
        np.full((ch, cw), fill, np.uint8),
        _blob_frame(ch // 2, cw // 2),
    ]

    def _mk_args(fr):
        if batch is None:
            crops = np.broadcast_to(fr, (k_frames, ch, cw)).copy()
            pos = jnp.asarray(np.array([ch // 2, cw // 2], np.int32))
            deltas = np.zeros((k_frames, 2), np.int32)
            lo = np.zeros((k_frames, 2), np.int32)
            hi = np.tile(np.array([[ch - 1, cw - 1]], np.int32), (k_frames, 1))
            f = np.uint8(fill)
        else:
            crops = np.broadcast_to(fr, (batch, k_frames, ch, cw)).copy()
            pos = jnp.asarray(np.tile(np.array([[ch // 2, cw // 2]], np.int32), (batch, 1)))
            deltas = np.zeros((batch, k_frames, 2), np.int32)
            lo = np.zeros((batch, k_frames, 2), np.int32)
            hi = np.tile(np.array([[[ch - 1, cw - 1]]], np.int32), (batch, k_frames, 1))
            f = jnp.full((batch,), fill, jnp.uint8)
        # stage the crops on device BEFORE timing: with numpy inputs the
        # probe mostly measured the H2D transfer (identical for both
        # engines, and 10-20x the exec time on a tunnel link) — the
        # production pipeline stages crops separately, so the decision must
        # rank dispatch+exec+fetch
        return (jnp.asarray(crops), pos, f, deltas, lo, hi)

    args = _mk_args(frame)

    def run(fn, a=None, reps=3):
        a = args if a is None else a
        out = fn(*a)
        jax.block_until_ready(out)  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        if subpixel:
            return (np.asarray(out[0]), np.asarray(out[1])), best
        return np.asarray(out), best

    def _parity(out_p, out_x):
        if not subpixel:
            return np.array_equal(out_p, out_x)
        # positions exact; offsets to float tolerance (the engines sum the
        # DoG response in different orders, so offset ulps may differ)
        return np.array_equal(out_p[0], out_x[0]) and np.allclose(
            out_p[1], out_x[1], atol=1e-3
        )

    try:
        pal = pallas_scan_fn(roi_spec, bounded=True, batched=batch is not None,
                             subpixel=subpixel)
        out_p, t_p = run(pal)
        out_x, t_x = run(base)
        if not _parity(out_p, out_x):
            # fail SAFE in production: keep the XLA engine and record the
            # mismatch; the hardware test suite asserts parity is True
            last_p = (out_p[0] if subpixel else out_p)[-1]
            last_x = (out_x[0] if subpixel else out_x)[-1]
            info = {
                "engine": "xla",
                "parity": False,
                "mismatch": [last_p.tolist(), last_x.tolist()],
            }
        else:
            # tie stress (measured, not assumed): both engines run the tie
            # geometries once; ANY divergence pins this environment+geometry
            # to XLA — its reduction order matches the CPU-verified oracle
            # path, so XLA's tie-breaks are the reference behavior
            tie_ok = True
            for tf in tie_frames:
                ta = _mk_args(tf)
                tp, _ = run(pal, ta, reps=1)
                tx, _ = run(base, ta, reps=1)
                if not _parity(tp, tx):
                    tie_ok = False
                    break
            # hysteresis: the fused kernel must win decisively. XLA's float
            # reduction order matches the CPU-verified oracle path on response
            # ties (cross-engine ties can flip the argmax by 1 px), so a
            # within-noise pallas win isn't worth trading tie stability for.
            info = {
                "engine": "pallas" if (tie_ok and t_p < 0.75 * t_x) else "xla",
                "pallas_ms": round(t_p * 1e3, 3),
                "xla_ms": round(t_x * 1e3, 3),
                "parity": True,
                "tie_parity": tie_ok,
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


def _select_batched_bounded(tracker, roi_spec, k_frames: int, batch: int, fill: int,
                            engine: str, subpixel: bool = False):
    """The batched bounded scan for the batch/multi ROI paths: the measured
    pallas/xla choice (``auto``, which fails safe to XLA when pallas is
    unavailable), or the named engine (an explicit ``"pallas"`` raises if the
    kernel cannot build — same contract as the single-video ``engine=``).
    ``subpixel`` selects between the fused bounded+subpixel kernel and the
    XLA ``scan_sub`` by the same measurement."""
    if engine == "auto":
        engine, _ = pick_bounded_engine_batch(roi_spec, k_frames, batch, fill,
                                              subpixel=subpixel)
    if engine == "pallas":
        from .ops.pallas_tracker import pallas_scan_fn

        return pallas_scan_fn(roi_spec, batched=True, bounded=True, subpixel=subpixel)
    return tracker.scan_sub if subpixel else tracker.scan_bounded


def _select_sharded_bounded(tracker, roi_spec, k_frames: int, batch: int, fill: int,
                            engine: str, mesh, subpixel: bool = False):
    """Mesh analog of :func:`_select_batched_bounded`: when the measured
    choice picks the fused kernel and the batch divides the mesh's ``data``
    axis, each chip runs the ``grid=(B/chips, T)`` fused Pallas kernel on its
    shard via ``shard_map`` (parallel.mesh.sharded_pallas_bounded); otherwise
    the sharded vmapped XLA scan. The measurement runs at the PER-SHARD batch
    size — that is the grid each chip actually executes."""
    data_size = mesh.shape.get("data", 1)
    if engine == "pallas" and batch % data_size:
        raise ValueError(
            f"engine='pallas' under a mesh needs the batch ({batch}) divisible "
            f"by the mesh data axis ({data_size})"
        )
    if engine == "auto" and batch % data_size == 0:
        engine, _ = pick_bounded_engine_batch(
            roi_spec, k_frames, max(batch // data_size, 1), fill, subpixel=subpixel
        )
    if engine == "pallas":
        from .parallel.mesh import sharded_pallas_bounded

        return sharded_pallas_bounded(roi_spec, mesh, subpixel=subpixel)
    return tracker.scan_sub if subpixel else tracker.scan_bounded


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


def _grouping_pays() -> bool:
    """Adaptive group growth is for RPC-linked devices (TPU): on the CPU
    backend a jit call is a function call, so growing groups there only
    compiles extra program sizes for nothing (and would make warm-call
    compile counts timing-dependent). ``PAWS_DISPATCH_GROUP`` still pins a
    size on any backend (tests, experiments)."""
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _to_host_async(*arrays):
    """Start device->host transfers early so the lagged drain doesn't block."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Engine adapters: hide the lane-axis shape difference between the unbatched
# single-target kernels and the batched/sharded scans. Both own the on-device
# position chain (prev handle + origin deltas) so the controller never touches
# device arrays directly.
# ---------------------------------------------------------------------------


class _ImmediateResult:
    """Future-shaped wrapper for the synchronous dispatch fallback."""

    __slots__ = ("_v",)

    def __init__(self, v):
        self._v = v

    def result(self):
        return self._v

    def done(self):
        return True

    def exception(self):
        return None


class _SerialDispatcher:
    """Run engine dispatch work on ONE worker thread, in submission order.

    The native decode call releases the GIL, so moving the H2D staging + jit
    enqueue off the main loop overlaps the per-chunk device RPC with decode
    (round-2 section timers: 'dispatch+upload' was ~37% of e2e wall time at
    depth 1 on the tunnel link, serialized with the single decode core).

    Strict FIFO on one thread preserves the engines' on-device position
    chain (``_prev``) exactly as in the synchronous path — results are
    bit-identical by construction — and makes buffer reuse safe: the
    controller only recycles a crop buffer after joining that chunk's
    future, and joining any task implies every earlier task (including its
    ``jnp.asarray`` copy of the buffer) has completed. ``reset`` is queued
    for the same reason: a direct reset could be overwritten by a stale
    queued task's ``_prev`` assignment. ``PAWS_SYNC_DISPATCH=1`` restores
    the inline path (debugging / profiling)."""

    def __init__(self):
        self._ex = None
        self._stage_ex = None
        if os.environ.get("PAWS_SYNC_DISPATCH") != "1":
            from concurrent.futures import ThreadPoolExecutor

            self._ex = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="paws-dispatch"
            )
            # H2D staging gets its OWN small pool: on the tunnel link
            # jnp.asarray BLOCKS for the transfer RPC (~2-20 ms per ROI
            # chunk, measured), and staging tasks are independent of each
            # other — serializing them with dispatches on the FIFO worker
            # stalled the chain and showed up as blocked drains. Dispatch
            # tasks join their entries' staging futures, so every ordering
            # the engines rely on (chain state, buffer recycle at drain)
            # is preserved. PAWS_STAGE_THREADS=0 restores the single-worker
            # staging (A/B: tools/tpu_interleave.py stage).
            n = int(os.environ.get("PAWS_STAGE_THREADS", "2"))
            if n > 0:
                self._stage_ex = ThreadPoolExecutor(
                    max_workers=n, thread_name_prefix="paws-stage"
                )

    def submit(self, fn, *args):
        if self._ex is None:
            return _ImmediateResult(fn(*args))
        return self._ex.submit(fn, *args)

    def submit_stage(self, fn, *args):
        """Submit an order-independent H2D staging task (falls back to the
        FIFO worker when the staging pool is disabled)."""
        if self._stage_ex is not None:
            return self._stage_ex.submit(fn, *args)
        return self.submit(fn, *args)

    def close(self):
        if self._ex is not None:
            self._ex.shutdown(wait=True)
            self._ex = None
        if self._stage_ex is not None:
            self._stage_ex.shutdown(wait=True)
            self._stage_ex = None


class _GroupDispatchBase:
    """RPC-coalescing group dispatch, shared by every engine adapter.

    On a remote-attached TPU each jit call is a tunnel RPC, and at the
    decode rates the native layer reaches the per-chunk round trip is the
    residual bottleneck (hostceil bench stage). Engines therefore STAGE
    dispatches and flush ``group_target`` of them as ONE jitted program
    (the ``make_super_*`` factories) + one result fetch. H2D still starts
    at stage time (a transfer task per entry on the FIFO worker) so upload
    keeps overlapping decode. ``group_target`` starts at 1 and is grown by
    the controller when the lagged drain still blocks at max depth; a
    mispredict replay resets it (staler aim buys only replays). Results are
    bit-identical at every group size — same inner scan, same chaining math
    — and containment validation never depends on dispatch shape.
    ``PAWS_DISPATCH_GROUP`` pins the size (debug/tests).

    Subclasses keep their on-device chain state in ``_prev`` (+ whatever
    else ``_reset_task`` clears), stage entries as tuples whose LAST element
    is the :class:`_GroupHandle`, and implement the device work:
    ``_run_first(entry)`` (no chain yet — consumes the absolute start),
    ``_run_chain(entry)`` (single chained scan) and ``_run_super(rest)``
    (S>=2 scans in one super-program), each returning per-entry results.
    All three run on the FIFO worker thread."""

    GROUP_MAX = 4

    def _init_grouping(self, group_allowed: bool = True):
        self._disp = _SerialDispatcher()
        self._prev = None
        self._stage: list = []  # staged entries, main thread only
        self._chain_started = False
        pin = os.environ.get("PAWS_DISPATCH_GROUP")
        self._group_pinned = bool(pin) and pin != "0"
        self._group_allowed = group_allowed
        want = min(int(pin), self.GROUP_MAX) if self._group_pinned else 1
        self.group_target = want if group_allowed else 1
        self._prewarm_started = False
        self._prewarm_ok = (
            group_allowed and not self._group_pinned and _grouping_pays()
            and os.environ.get("PAWS_SUPER_PREWARM", "1") != "0"
        )

    def _maybe_prewarm(self, buf_shape):
        """First dispatch: start compiling the S=2..GROUP_MAX super-programs
        on a background thread, so adaptive group growth never pays an XLA
        compile stall mid-run (profiled: a first S=4 flush on the tunnel
        backend blocked a measured pass ~1.4 s — the tunnel's server-side
        compile means no process ever finds it cached). One dummy crop is
        transferred and reused for all S slots, so the channel cost is a
        single chunk upload. Only where growth can actually reach those
        sizes (RPC-linked backend, growth not pinned/disallowed);
        PAWS_SUPER_PREWARM=0 disables."""
        if self._prewarm_started:
            return
        self._prewarm_started = True
        if not self._prewarm_ok:
            return
        import threading

        def quiet():
            try:
                self._prewarm_supers(buf_shape)
            except Exception as e:  # pragma: no cover - best-effort warm
                logger.debug("super-program prewarm failed: %s", e)

        threading.Thread(target=quiet, daemon=True,
                         name="paws-super-prewarm").start()

    def reset(self):
        """Invalidate the on-device chain (replay / run start). The stage
        list is main-thread state (cleared here — the controller never
        drains these handles again); the device-side clear is queued so a
        stale in-flight task's ``_prev`` assignment cannot overwrite it."""
        self._stage.clear()
        self._chain_started = False
        if not self._group_pinned:
            self.group_target = 1
        self._disp.submit(self._reset_task)

    def grow_group(self, cap: int = GROUP_MAX):
        """Controller signal: the lagged drain still blocks at max pipeline
        depth — coalesce more chunk dispatches per RPC. ``cap`` is the
        overlap bound (depth+1)//2: beyond it a group cannot finish executing
        before its leader is drained, and grouping would SERIALIZE decode
        against the device instead of amortizing the RPC (measured: pinned
        S=4 at shallow depth is ~25% slower e2e than S=1)."""
        if (self._group_allowed and not self._group_pinned
                and self.group_target < min(cap, self.GROUP_MAX)):
            self.group_target += 1

    def _reset_task(self):
        self._prev = None

    def _stage_entry(self, entry):
        """Stage one dispatch; flush when the group fills. The first dispatch
        of a chain flushes alone: the group program assumes an existing
        on-device chain (``_run_first`` handles the absolute start)."""
        self._stage.append(entry)
        if len(self._stage) >= self.group_target or not self._chain_started:
            self._flush()
        self._chain_started = True
        return entry[-1]

    def _flush(self):
        if not self._stage:
            return
        entries, self._stage = self._stage, []
        fut = self._disp.submit(self._group_task, entries)
        for i, e in enumerate(entries):
            e[-1].fut, e[-1].idx = fut, i

    def _group_task(self, entries):
        results = [None] * len(entries)
        i = 0
        if self._prev is None:
            results[0] = self._run_first(entries[0])
            i = 1
        rest = entries[i:]
        if len(rest) == 1:
            results[i] = self._run_chain(rest[0])
        elif rest:
            for s, r in enumerate(self._run_super(rest)):
                results[i + s] = r
        return results

    def _materialize(self, handle):
        """Join a handle's group (flushing a partial group first if the
        controller drained before it filled)."""
        if handle.fut is None:
            self._flush()
        return handle.result()

    def ready(self, handle) -> bool:
        """Non-blocking: True when draining ``handle`` will not block — its
        group task finished AND the positions device array is computed (the
        D2H copy was started at ``_finish`` time, so ``np.asarray`` is then a
        join of an already-running copy). Unflushed handles are never ready:
        eager drains must not force partial-group flushes. The controller
        uses this to drain opportunistically — see
        :meth:`SpeculativePipeline.run`."""
        fut = handle.fut
        if fut is None or not fut.done():
            return False
        if fut.exception() is not None:
            return True  # draining materializes and raises it
        pos = fut.result()[handle.idx][0]
        is_r = getattr(pos, "is_ready", None)
        return True if is_r is None else bool(is_r())

    def close(self):
        self._disp.close()


class _SingleEngine(_GroupDispatchBase):
    """Lane adapter for L=1 over the UNBATCHED scans — keeps the measured
    single-target engine (fused Pallas or XLA) byte-for-byte. Group dispatch
    via :class:`_GroupDispatchBase` (super-programs from
    :func:`make_super_chain`)."""

    def __init__(self, scan_first, scan_chain, crop_shape, frame_shape, fill, subpixel, timer):
        import jax.numpy as jnp

        self._jnp = jnp
        self.scan_first = scan_first
        self.scan_chain = scan_chain
        self.ch, self.cw = crop_shape
        self.H, self.W = frame_shape
        self.fill_dev = np.uint8(fill)
        self.subpixel = subpixel
        self.timer = timer
        self._prev_origin = None
        self._init_grouping()

    def _reset_task(self):
        self._prev = None
        self._prev_k = None
        self._prev_origin = None

    def dispatch(self, buf, origins, P_abs, valid=None):
        # copy everything the controller mutates after dispatch (P_abs is
        # the live self.P; origins is fresh per iteration but cheap to pin);
        # start the H2D now so upload overlaps the next chunk's decode.
        # ``valid`` is the chunk's REAL frame count — the scan runs all K
        # rows, but the chain must continue from the last real one
        self._maybe_prewarm(buf.shape)
        xfut = self._disp.submit_stage(self._jnp.asarray, buf[0])
        k = buf.shape[1] if valid is None else int(valid[0])
        return self._stage_entry(
            (xfut, origins[0].copy(), P_abs[0].copy(), k, _GroupHandle())
        )

    def _prewarm_supers(self, buf_shape):
        import jax

        _, K, ch, cw = buf_shape
        crop = self._jnp.asarray(np.zeros((K, ch, cw), np.uint8))
        prev = self._jnp.asarray(np.zeros((K, 2), np.int32))
        for S in range(2, self.GROUP_MAX + 1):
            sup = make_super_chain(self.scan_first, S, self.subpixel)
            deltas = np.zeros((S, K, 2), np.int32)
            los = np.zeros((S, K, 2), np.int32)
            his = np.tile(np.array([[[ch - 1, cw - 1]]], np.int32), (S, K, 1))
            jax.block_until_ready(
                sup((crop,) * S, prev, np.int32(K),
                    np.full(S, K, np.int32), deltas, self.fill_dev, los, his)
            )

    def _bounds(self, o):
        """Per-frame clamp box: frame bounds mapped into each frame's crop
        coordinates. ``o`` is the chunk's per-frame origins ``[K, 2]``."""
        lo = np.maximum(-o, 0).astype(np.int32)
        hi = np.minimum(
            [self.ch - 1, self.cw - 1],
            [self.H - 1, self.W - 1] - o,
        ).astype(np.int32)
        return lo, hi

    def _deltas(self, o, prev_last):
        """Per-frame rebase vector for the scan: ``d[0]`` maps the carried
        position from ``prev_last`` (the previous chunk's LAST frame origin,
        or this chunk's own first origin for a chain start) into frame 0's
        coordinates; ``d[i] = o[i-1] - o[i]`` thereafter."""
        d = np.empty_like(o)
        d[0] = prev_last - o[0]
        d[1:] = o[:-1] - o[1:]
        return d.astype(np.int32)

    def _finish(self, out, o, k):
        if self.subpixel:
            pos, off = out
            _to_host_async(pos, off)
        else:
            pos, off = out, None
            _to_host_async(pos)
        # the chain continues from the last REAL row: its position handle,
        # its frame count, and the origin that row was cropped at
        self._prev, self._prev_k = pos, np.int32(k)
        self._prev_origin = o[max(k - 1, 0)]
        return (pos, off)

    def _run_first(self, entry):
        xfut, o, P0, k, _ = entry
        lo, hi = self._bounds(o)
        deltas = self._deltas(o, o[0])
        pos_rel = self._jnp.asarray((P0 - o[0]).astype(np.int32))
        with self.timer.section("device"):
            out = self.scan_first(xfut.result(), pos_rel, self.fill_dev,
                                  deltas, lo, hi)
        return self._finish(out, o, k)

    def _run_chain(self, entry):
        xfut, o, _, k, _ = entry
        lo, hi = self._bounds(o)
        deltas = self._deltas(o, self._prev_origin)
        with self.timer.section("device"):
            out = self.scan_chain(xfut.result(), self._prev, self._prev_k,
                                  self.fill_dev, deltas, lo, hi)
        return self._finish(out, o, k)

    def _run_super(self, rest):
        S = len(rest)
        sup = make_super_chain(self.scan_first, S, self.subpixel)
        origins = [e[1] for e in rest]
        ks = [e[3] for e in rest]
        prev_last = [self._prev_origin] + [
            origins[s][max(ks[s] - 1, 0)] for s in range(S - 1)
        ]
        deltas = np.stack(
            [self._deltas(origins[s], prev_last[s]) for s in range(S)]
        )
        bounds = [self._bounds(o) for o in origins]
        los = np.stack([b[0] for b in bounds])
        his = np.stack([b[1] for b in bounds])
        crops = tuple(e[0].result() for e in rest)
        with self.timer.section("device"):
            outs = sup(crops, self._prev, self._prev_k,
                       np.asarray(ks, np.int32), deltas, self.fill_dev,
                       los, his)
        return [
            self._finish(out, origins[s], ks[s]) for s, out in enumerate(outs)
        ]

    def to_host(self, handle):
        pos, off = self._materialize(handle)
        pos_np = np.asarray(pos)[None]  # [1, K, 2]
        off_np = None if off is None else np.asarray(off)[None]
        return pos_np, off_np


class _BatchedEngine(_GroupDispatchBase):
    """Lane adapter over the batched bounded scans ``fn([L,K,ch,cw], [L,2],
    [L], [L,2], [L,2])`` — vmapped XLA, the grid=(L,T) fused Pallas kernel,
    or the mesh-sharded variants (``shard`` places host arrays on the mesh).

    Group dispatch works as in :class:`_SingleEngine` (the per-chunk RPC
    cost is per DISPATCH, not per lane, so N-target streams gain the same
    ~S× reduction) — including under a mesh: the super-program is jitted
    without explicit shardings, exactly like the per-chunk chained program,
    so GSPMD propagates the crops' batch sharding (placed by ``shard``)
    through the group while the small replicated operands (carry seeds,
    origins, bounds) follow; results are bit-identical to per-chunk
    dispatch (pinned by the virtual-mesh forced-group test)."""

    def __init__(self, scan_bounded, crop_shape, frame_shape, fills_dev, subpixel, timer, shard=None):
        import jax.numpy as jnp

        self._jnp = jnp
        self.scan = scan_bounded
        self.chain = make_chained_batch(scan_bounded)
        self.ch, self.cw = crop_shape
        self.frame_max = np.array([frame_shape[0] - 1, frame_shape[1] - 1])
        self.fills_dev = fills_dev
        self.subpixel = subpixel
        self.timer = timer
        self.shard = shard if shard is not None else jnp.asarray
        self._init_grouping()

    def _reset_task(self):
        # absolute per-lane position carry [B, 2] int32 on device (see
        # make_chained_batch); None = no chain yet (the next dispatch seeds
        # it from the entry's host P_abs)
        self._prev = None

    def dispatch(self, buf, origins, P_abs, valid=None):
        self._maybe_prewarm(buf.shape)
        xfut = self._disp.submit_stage(self.shard, buf)
        ks = (np.full(buf.shape[0], buf.shape[1], np.int64)
              if valid is None else np.asarray(valid))
        return self._stage_entry(
            (xfut, origins.copy(), P_abs.copy(), ks.copy(), _GroupHandle())
        )

    def _prewarm_supers(self, buf_shape):
        import jax

        L, K, ch, cw = buf_shape
        crop = self.shard(np.zeros((L, K, ch, cw), np.uint8))
        carry = self._jnp.asarray(np.zeros((L, 2), np.int32))
        for S in range(2, self.GROUP_MAX + 1):
            sup = make_super_chain_batch(self.scan, S, self.subpixel)
            deltas = np.zeros((S, L, K, 2), np.int32)
            los = np.zeros((S, L, K, 2), np.int32)
            his = np.tile(np.array([[[[ch - 1, cw - 1]]]], np.int32), (S, L, K, 1))
            jax.block_until_ready(
                sup((crop,) * S, carry, np.full((S, L), K, np.int32),
                    np.zeros((S, L, 2), np.int32), np.zeros((S, L, 2), np.int32),
                    deltas, self.fills_dev, los, his)
            )

    def _bounds(self, origins):
        """Per-lane per-frame clamp box; ``origins`` is ``[L, K, 2]``."""
        lo = np.maximum(-origins, 0).astype(np.int32)
        hi = np.minimum(
            [self.ch - 1, self.cw - 1], self.frame_max - origins
        ).astype(np.int32)
        return lo, hi

    @staticmethod
    def _deltas(origins):
        """Per-lane per-frame rebase ``[L, K, 2]``; ``d[:, 0]`` is zero —
        the chunk-to-chunk shift is the carry rebase inside the chain."""
        d = np.zeros_like(origins)
        d[:, 1:] = origins[:, :-1] - origins[:, 1:]
        return d.astype(np.int32)

    @staticmethod
    def _last_origin(origins, ks):
        """Per-lane origin of the last REAL frame: ``origins[b, ks[b]-1]``."""
        idx = np.maximum(np.asarray(ks) - 1, 0)
        return origins[np.arange(origins.shape[0]), idx]

    def _finish(self, out):
        if self.subpixel:
            pos, off = out
            _to_host_async(pos, off)
        else:
            pos, off = out, None
            _to_host_async(pos)
        return (pos, off)

    def _chain_args(self, origins, ks):
        lo, hi = self._bounds(origins)
        return (
            self._jnp.asarray(np.asarray(ks, np.int32)),
            self._jnp.asarray(origins[:, 0].astype(np.int32)),
            self._jnp.asarray(self._last_origin(origins, ks).astype(np.int32)),
            self.shard(self._deltas(origins)),
            self.shard(lo),
            self.shard(hi),
        )

    def _run_first(self, entry):
        # seed the absolute carry from the controller's positions, then the
        # first chunk chains like any other (its rebase consumes the seed)
        self._prev = self._jnp.asarray(entry[2].astype(np.int32))
        return self._run_chain(entry)

    def _run_chain(self, entry):
        xfut, origins, _, ks, _ = entry
        ksd, o0, olast, deltas, lo, hi = self._chain_args(origins, ks)
        with self.timer.section("device"):
            out, self._prev = self.chain(
                xfut.result(), self._prev, ksd, o0, olast,
                self.fills_dev, deltas, lo, hi,
            )
        return self._finish(out)

    def _run_super(self, rest):
        S = len(rest)
        sup = make_super_chain_batch(self.scan, S, self.subpixel)
        origins_l = [e[1] for e in rest]
        ks_l = [e[3] for e in rest]
        kss = np.stack(ks_l).astype(np.int32)
        origin0s = np.stack([o[:, 0] for o in origins_l]).astype(np.int32)
        origin_lasts = np.stack(
            [self._last_origin(origins_l[s], ks_l[s]) for s in range(S)]
        ).astype(np.int32)
        deltas = np.stack([self._deltas(o) for o in origins_l])
        bounds = [self._bounds(o) for o in origins_l]
        los = np.stack([b[0] for b in bounds])
        his = np.stack([b[1] for b in bounds])
        crops = tuple(e[0].result() for e in rest)
        with self.timer.section("device"):
            outs, self._prev = sup(
                crops, self._prev, kss, origin0s, origin_lasts,
                deltas, self.fills_dev, los, his,
            )
        return [self._finish(out) for out in outs]

    def to_host(self, handle):
        pos, off = self._materialize(handle)
        return np.asarray(pos), (None if off is None else np.asarray(off))


# ---------------------------------------------------------------------------
# Lane sources: pluggable frame delivery. Each fills a caller-provided crop
# buffer ``buf[L, K, ch, cw]`` at given per-lane origins and later releases /
# recycles / diagnoses the accepted frames. Tokens are opaque to the
# controller (RETAINED sentinel, a shared numpy chunk, or a per-lane list).
# ---------------------------------------------------------------------------


class SingleVideoSource:
    """One video, one target lane. Delivery: C++ retained ring (predict),
    direct C++ ROI reads (contain), or a prefetched full-frame chunk cropped
    in Python (with optional per-frame diagnostics)."""

    def __init__(self, src, *, K, ch, cw, fill, dia, mode, native_roi, depth,
                 n_rest, prefetchers):
        from .diagnose import Dont

        self.src = src
        self.K, self.ch, self.cw, self.fill = K, ch, cw, fill
        self.dia = dia
        self.mode = mode
        self.keep_for_dia = not isinstance(dia, Dont)
        # contain-mode native reads don't retain frames, so diagnostics (which
        # read each frame at accept time) pin the prefetcher delivery there
        self.use_native_roi = native_roi and mode == "contain" and not self.keep_for_dia
        # retained reads DEADLOCK if the ring cannot hold the in-flight chunks
        # plus one decoding chunk, so require a ring sized by the caller.
        # Diagnostics stay ON the native fast path when the .so can serve
        # zero-copy retained-frame views (accept() overlays straight from the
        # ring before releasing) — the round-4 ~10x diagnostics cliff fix.
        self.use_native_retained = (
            native_roi
            and mode == "predict"
            and hasattr(src, "read_roi_chunk_retained")
            and getattr(src, "ring_frames", 0) >= (depth + 2) * K
            and (not self.keep_for_dia or getattr(src, "can_view_retained", False))
        )
        self._pf = None
        if not (self.use_native_roi or self.use_native_retained):
            self._pf = ChunkPrefetcher(src, K, max_frames=n_rest)
            prefetchers.append(self._pf)
            self._it = iter(self._pf)

    def acquire(self, remaining, origins, buf, timer):
        o = origins[0]  # [K, 2] per-frame origins for this lane
        if self.use_native_roi or self.use_native_retained:
            reader = (
                self.src.read_roi_chunk_retained
                if self.use_native_retained
                else self.src.read_roi_chunk
            )
            with timer.section("crop"):
                got = reader(
                    min(self.K, remaining), o, self.ch, self.cw,
                    self.fill, out=buf[0],
                )
            k = got.shape[0]
            if k == 0:
                return None
            for i in range(k, self.K):
                buf[0, i] = buf[0, k - 1]
            return (RETAINED if self.use_native_retained else None, np.array([k]))
        chunk = next(self._it, None)
        if chunk is None or chunk.shape[0] == 0:
            return None
        k = chunk.shape[0]
        with timer.section("crop"):
            for i in range(k):
                _crop_with_fill(chunk[i], o[i], self.ch, self.cw, self.fill, out=buf[0, i])
        for i in range(k, self.K):
            buf[0, i] = buf[0, k - 1]
        # predict mode retains the frames for exact replay; diagnostics also
        # need them — otherwise recycle immediately
        if not (self.mode == "predict" or self.keep_for_dia):
            self._pf.recycle(chunk)
            chunk = None
        return (chunk, np.array([k]))

    def recrop(self, tokens, valid, origins, rbuf, timer, base, off):
        k = int(valid[0])
        o = origins[0]  # [K, 2]
        f0 = int(off[0])  # frame offset within tokens (split sub-chunks)
        with timer.section("crop"):
            if tokens is RETAINED:
                # the entry's frames sit behind the re-dispatched chunks
                # still in flight (unaccepted, hence unreleased): ``base``
                # is their frame count, the offset into the retained window
                self.src.recrop(int(base[0]), k, o,
                                self.ch, self.cw, self.fill, out=rbuf[0])
            else:
                for i in range(k):
                    _crop_with_fill(tokens[f0 + i], o[i], self.ch, self.cw,
                                    self.fill, out=rbuf[0, i])
            for i in range(k, self.K):
                rbuf[0, i] = rbuf[0, k - 1]

    def accept(self, tokens, valid, abs_pos, timer, off):
        k = int(valid[0])
        f0 = int(off[0])
        if tokens is RETAINED:
            if self.keep_for_dia:
                # overlay straight from the ring (zero-copy views), THEN
                # release — the frames are the oldest retained
                with timer.section("diagnose"):
                    for i in range(k):
                        self.dia(self.src.retained_frame(i), abs_pos[0, i])
            self.src.release(k)  # this chunk's frames are the oldest retained
        elif tokens is not None:
            with timer.section("diagnose"):
                for i in range(k):
                    self.dia(tokens[f0 + i], abs_pos[0, i])
            if f0 + k == tokens.shape[0]:  # last sub-chunk recycles the array
                self._pf.recycle(tokens)


class FanoutSource:
    """One video stream, N target lanes: each decoded chunk yields N per-lane
    crops (C++ ``recrop`` from the retained ring when available, else Python
    crops of a shared prefetched chunk)."""

    def __init__(self, src, *, N, K, ch, cw, fill, mode, depth, n_rest, prefetchers,
                 dia=None):
        from .diagnose import Dont

        self.src = src
        self.N, self.K, self.ch, self.cw, self.fill = N, K, ch, cw, fill
        self.mode = mode
        self.dia = dia
        self.keep_for_dia = dia is not None and not isinstance(dia, Dont)
        # the fan-out crops per target via advance/recrop at EVERY depth
        # (contain mode included) — the capability gate is the ring size;
        # diagnostics ride the ring too when the .so serves zero-copy
        # retained-frame views (same rule as SingleVideoSource)
        self.native = (
            hasattr(src, "read_roi_chunk_retained")
            and getattr(src, "ring_frames", 0) >= (depth + 2) * K
            and (not self.keep_for_dia or getattr(src, "can_view_retained", False))
        )
        self._retained = 0  # frames advanced into the ring but not released
        self._pf = None
        if not self.native:
            self._pf = ChunkPrefetcher(src, K, max_frames=n_rest)
            prefetchers.append(self._pf)
            self._it = iter(self._pf)

    def _crop_lanes(self, frames, k, origins, buf, base, timer, f0=0):
        with timer.section("crop"):
            for t in range(self.N):
                o = origins[t]  # [K, 2] per-frame origins for this lane
                if frames is RETAINED:
                    self.src.recrop(base, k, o, self.ch, self.cw,
                                    self.fill, out=buf[t])
                else:
                    for i in range(k):
                        _crop_with_fill(frames[f0 + i], o[i], self.ch, self.cw,
                                        self.fill, out=buf[t, i])
                for i in range(k, self.K):
                    buf[t, i] = buf[t, k - 1]

    def acquire(self, remaining, origins, buf, timer):
        if self.native:
            base = self._retained
            k = self.src.advance_retained(min(self.K, remaining))
            if not k:
                return None
            self._retained += k
            self._crop_lanes(RETAINED, k, origins, buf, base, timer)
            return (RETAINED, np.full(self.N, k, np.int64))
        chunk = next(self._it, None)
        if chunk is None or chunk.shape[0] == 0:
            return None
        k = chunk.shape[0]
        self._crop_lanes(chunk, k, origins, buf, 0, timer)
        return (chunk, np.full(self.N, k, np.int64))

    def recrop(self, tokens, valid, origins, rbuf, timer, base, off):
        # all lanes share the stream, so the retained-window offset is the
        # (equal) per-lane in-flight frame count
        self._crop_lanes(tokens, int(valid[0]), origins, rbuf, int(base[0]),
                         timer, f0=int(off[0]))

    def accept(self, tokens, valid, abs_pos, timer, off):
        k = int(valid[0])
        f0 = int(off[0])
        if tokens is RETAINED:
            if self.keep_for_dia:
                with timer.section("diagnose"):
                    for i in range(k):
                        self.dia(self.src.retained_frame(i), abs_pos[:, i])
            self.src.release(k)
            self._retained -= k
        elif tokens is not None:
            if self.keep_for_dia:
                with timer.section("diagnose"):
                    for i in range(k):
                        self.dia(tokens[f0 + i], abs_pos[:, i])
            if f0 + k == tokens.shape[0]:  # last sub-chunk recycles the array
                self._pf.recycle(tokens)


class PerVideoSource:
    """B independent videos, one lane each: per-lane EOF, fill values and
    diagnostics; delivery per lane is the C++ retained ring or a per-video
    prefetcher."""

    def __init__(self, sources, *, K, ch, cw, fills, dias, ns, nat_retained,
                 prefetcher_objs):
        from .diagnose import Dont

        B = len(sources)
        self.sources = sources
        self.B, self.K, self.ch, self.cw = B, K, ch, cw
        self.fills = fills
        self.dias = dias
        self.keeps = [d is not None and not isinstance(d, Dont) for d in dias]
        self.nat_retained = nat_retained
        self.active = [True] * B
        if nat_retained:
            self._left = [n - 1 for n in ns]  # frames still to track per video
            self._retained = [0] * B
            self._pf = None
        else:
            self._pf = prefetcher_objs
            self._its = [iter(p) for p in prefetcher_objs]

    def acquire(self, remaining, origins, buf, timer):
        valid = np.zeros(self.B, np.int64)
        tokens = [None] * self.B
        with timer.section("crop"):
            for b in range(self.B):
                k = 0
                if self.active[b]:
                    if self.nat_retained:
                        base = self._retained[b]
                        want = min(self.K, self._left[b], max(int(remaining), 1))
                        k = self.sources[b].advance_retained(want)
                        if k == 0:
                            self.active[b] = False
                        else:
                            self._retained[b] += k
                            self._left[b] -= k
                            # short of the REQUEST means decoder EOF (a
                            # remaining-clamped short probe is intentional)
                            if k < want or self._left[b] == 0:
                                self.active[b] = False
                            tokens[b] = RETAINED
                            o = origins[b]  # [K, 2]
                            self.sources[b].recrop(
                                base, k, o, self.ch, self.cw,
                                int(self.fills[b]), out=buf[b],
                            )
                    else:
                        chunk = next(self._its[b], None)
                        if chunk is None or chunk.shape[0] == 0:
                            self.active[b] = False
                        else:
                            k = chunk.shape[0]
                            tokens[b] = chunk
                            if k < self.K:
                                self.active[b] = False
                            o = origins[b]  # [K, 2]
                            for i in range(k):
                                _crop_with_fill(chunk[i], o[i], self.ch, self.cw,
                                                int(self.fills[b]), out=buf[b, i])
                if k > 0:
                    valid[b] = k
                    for i in range(k, self.K):
                        buf[b, i] = buf[b, k - 1]
                else:
                    buf[b] = self.fills[b]
        if valid.sum() == 0:
            return None
        return (tokens, valid)

    def recrop(self, tokens, valid, origins, rbuf, timer, base, off):
        with timer.section("crop"):
            for b in range(self.B):
                k = int(valid[b])
                if k > 0:
                    o = origins[b]  # [K, 2]
                    f0 = int(off[b])
                    if tokens[b] is RETAINED:
                        self.sources[b].recrop(int(base[b]), k, o,
                                               self.ch, self.cw, int(self.fills[b]),
                                               out=rbuf[b])
                    else:
                        for i in range(k):
                            _crop_with_fill(tokens[b][f0 + i], o[i], self.ch, self.cw,
                                            int(self.fills[b]), out=rbuf[b, i])
                    for i in range(k, self.K):
                        rbuf[b, i] = rbuf[b, k - 1]
                else:
                    rbuf[b] = self.fills[b]

    def accept(self, tokens, valid, abs_pos, timer, off):
        for b in range(self.B):
            k = int(valid[b])
            f0 = int(off[b])
            if k > 0:
                if tokens[b] is RETAINED:
                    if self.keeps[b]:
                        with timer.section("diagnose"):
                            for i in range(k):
                                self.dias[b](self.sources[b].retained_frame(i),
                                             abs_pos[b, i])
                    self.sources[b].release(k)
                    self._retained[b] -= k
                else:
                    with timer.section("diagnose"):
                        for i in range(k):
                            self.dias[b](tokens[b][f0 + i], abs_pos[b, i])
            if (tokens[b] is not None and tokens[b] is not RETAINED
                    and f0 + k == tokens[b].shape[0]):
                self._pf[b].recycle(tokens[b])


# ---------------------------------------------------------------------------
# THE controller. Dispatch / drain / containment-validate / replay /
# auto-depth exist exactly once, generic over the lane axis.
# ---------------------------------------------------------------------------


#: converged auto-depth memo, per (lanes, K, crop, frame, mode) geometry and
#: process: the auto controller ramps from depth 1 by observing blocked
#: drains (one step per blocked chunk), which costs ~5% e2e on short clips
#: (measured vs the converged fixed depth, docs/bench_history.md
#: "continued-3"). Later runs with the same geometry start where the last
#: run converged — results are identical at every depth, so the memo is
#: purely a warm-start; replays still reset to 1 and re-ramp within a run.
_AUTO_DEPTH_MEMO: dict = {}


class _Pending:
    """One in-flight (or rewind-queued) chunk: the engine handle plus
    everything needed to validate, accept, or re-dispatch it.

    ``exact``: dispatched through the rewind queue with nothing in flight,
    i.e. aimed from the EXACT last accepted position — the replay progress
    candidate. ``blind``: aimed BEFORE any velocity estimate existed (the
    run-start probe): its miss is a property of the standing-still guess,
    not of the speculation horizon, so the error-gated depth controller
    must not learn from it. ``off`` (``[L]``): frame offset of this entry
    within its ``tokens`` (nonzero only for the sub-chunks of a SPLIT exact
    entry; the retained-ring delivery never needs it — ring position is
    in-flight arithmetic — but numpy-chunk delivery slices
    ``tokens[off + i]``)."""

    __slots__ = ("handle", "origins", "valid", "tokens", "buf", "exact", "off",
                 "blind")

    def __init__(self, handle, origins, valid, tokens, buf, exact=False, off=None,
                 blind=False):
        self.handle = handle
        self.origins = origins
        self.valid = valid
        self.tokens = tokens
        self.buf = buf
        self.exact = exact
        self.off = np.zeros(len(valid), np.int64) if off is None else off
        self.blind = blind


class SpeculativePipeline:
    """The speculative ROI pipeline state machine, generic over ``L >= 1``
    lanes (targets or videos).

    Composition: a lane *source* delivers per-lane crops into rotating
    ``[L, K, ch, cw]`` buffers (and can exactly re-crop retained frames for
    replay); a lane *engine* owns the on-device position chain and the
    jitted scans; a *sink* callback accumulates accepted absolute positions.
    The controller owns everything the three original copies duplicated:
    velocity-extrapolated crop aiming, the pending deque, the lagged drain
    with ``AUTO_DRAIN_BLOCK_S`` auto-deepening, per-lane containment
    validation, and pipelined mispredict replay via the rewind queue
    (reference hot-loop drift bound: src/PawsomeTracker.jl:55-62).
    """

    def __init__(self, *, L, K, crop_shape, margin, spec, mode, depth, engine,
                 source, sink, timer, auto_cap=None):
        self.L, self.K = L, K
        self.ch, self.cw = crop_shape
        self.margin = np.asarray(margin)
        self.H, self.W = spec.frame_shape
        # containment half-extent: window radii + kernel apron of the FULL
        # spec (the windows the equivalent full-frame scan would read)
        self.rh = np.array(spec.radii) + spec.kernel_len // 2
        self.frame_max = np.array([self.H - 1, self.W - 1])
        self.mode = mode
        self.auto_depth = depth == "auto"
        if self.auto_depth:
            # auto_cap is the single owner of the memory/ring bound when the
            # frontend computed one (it already folded auto_depth_cap in);
            # direct constructions without it get the memory cap here
            self.depth_max = (
                auto_cap if auto_cap is not None
                else auto_depth_cap(spec.frame_shape, K)
            )
        else:
            self.depth_max = depth
        self._memo_key = (L, K, crop_shape, spec.frame_shape, mode)
        if self.auto_depth:
            memo_depth, memo_cap, memo_group = _AUTO_DEPTH_MEMO.get(
                self._memo_key, (1, AUTO_DEPTH_MAX, 1)
            )
            self.depth_cur = min(memo_depth, self.depth_max)
        else:
            self.depth_cur = depth
            memo_cap, memo_group = AUTO_DEPTH_MAX, 1
        self._memo_group = memo_group
        self.engine = engine
        self.source = source
        self.sink = sink
        self.timer = timer
        self._grow_groups = _grouping_pays()
        # rotating crop buffers: a buffer is reused only after its chunk's
        # result is drained, so an in-flight device transfer never reads a
        # mutated buffer. _POOL_MAX bounds transient growth from buffer-less
        # split entries (each allocates lazily when the pool runs dry).
        self._pool_max = self.depth_max + 2
        self._free = [np.empty((L, K, self.ch, self.cw), np.uint8)
                      for _ in range(self._pool_max)]
        self._pending: deque = deque()  # of _Pending
        self._rewind: deque = deque()  # replayed entries awaiting re-dispatch
        # eager opportunistic drain (PAWS_EAGER_DRAIN=0 disables): drain
        # results the moment they are READY (non-blocking check) instead of
        # always running exactly ``depth`` chunks behind. Results are
        # bit-identical (drain order stays FIFO); the gain is that the aim
        # staleness tracks the ACTUAL in-flight latency instead of the
        # worst-case depth*K frames — deep pipelines stop paying for their
        # slack in extrapolation error (measured: pinned depth 11 replay-
        # storms with lazy drains), and crop buffers recycle sooner.
        self._ready = (
            getattr(engine, "ready", None)
            if os.environ.get("PAWS_EAGER_DRAIN", "1") != "0"
            else None
        )
        # replay-depth hysteresis (see _replay): a soft ceiling just below
        # the depth that last mispredicted, relaxed after sustained clean
        # chunks — without it the controller OSCILLATES on motion whose
        # prediction error sits near the margin slack at depth_max horizons
        # (replay halves depth, blocked drains ramp it straight back, it
        # replays again: profiled 4-8 replays per 480-frame bench pass, each
        # redoing ~depth*K frames of crop+scan — ~47% duplicated work,
        # the bulk of the e2e-vs-hostceil gap in BENCH_r03)
        # warm-start the soft cap from the memo as well: without it every
        # run re-probes the known-bad horizon once at full depth and pays a
        # ~depth*K-frame replay before re-learning what the LAST run already
        # knew (profiled: 2-5 start-of-run replays per bench rep)
        self._depth_soft_cap = min(self.depth_max, memo_cap)
        self._clean_since_replay = 0
        # exploration control for the soft cap: relaxing it re-probes a
        # horizon that may replay (a ~depth*K-frame redo), so exploration is
        # (a) demand-driven — only after a drain actually blocked AT the cap,
        # i.e. more depth would help — and (b) exponentially backed off each
        # time an exploration fails (the clip keeps proving the horizon bad)
        self._cap_wanted = False
        self._relax_need = self.CLEAN_RELAX_CHUNKS
        # per-axis prediction-error budget: the slack portion of the margin
        # (what _update_depth_from_error normalizes the observed miss by)
        self._slack = np.maximum(np.asarray(self.margin) - self.rh, 1)

    #: accepted chunks WITHOUT a replay before the soft depth cap relaxes by
    #: one step — long enough that a marginal horizon must prove itself over
    #: ~2 full pipelines of chunks, short enough to recover from a
    #: startup-transient replay within a clip
    CLEAN_RELAX_CHUNKS = 16

    #: per-axis curvature clamp (px/frame²) for the quadratic aim term:
    #: physical turning motion has small true curvature (the bench circle:
    #: ~0.1), while secant-difference noise on erratic motion is large —
    #: the clamp keeps curvature tracking for smooth paths without letting
    #: noise amplified by stale² swing the aim (a bad aim is only a replay,
    #: but replays reset the pipeline depth)
    ACCEL_CLAMP = 0.25

    #: turn-rate clamp (rad/frame) for the coordinated-turn aim: 0.1 is a
    #: full turn in ~63 frames — faster apparent turning is secant noise on
    #: erratic motion, which long horizons must not amplify (the ACCEL_CLAMP
    #: already bounds ω to ~ACCEL_CLAMP/|v| for fast targets; this clamp
    #: additionally protects the slow-|v| regime where that ratio blows up)
    OMEGA_CLAMP = 0.1

    # -- aiming -------------------------------------------------------------
    def _aim(self):
        """Per-lane PER-FRAME crop origins ``[L, K, 2]``: frame ``i`` of the
        next chunk is cropped at the predicted position of its own window
        center (the PREVIOUS frame's position, horizon ``staleness + i``).
        Per-frame aiming means the margin never has to cover in-chunk motion
        — the crop rides along the predicted path — so crop bytes are set by
        prediction error alone, independent of ``K``."""
        if self.mode == "predict":
            # per-lane staleness: frames in flight ahead of the newest
            # downloaded position
            stale = np.zeros(self.L, np.int64)
            for ent in self._pending:
                stale += ent.valid
            h = (stale[:, None] + np.arange(self.K)[None, :]).astype(np.float64)
            h = h[..., None]  # [L, K, 1]
            # Extrapolation model. The chunk secant estimates the velocity at
            # the chunk MIDPOINT, (k-1)/2 frames behind P — on turning motion
            # that lag is a systematic bias of accel*lag*h (~17 px at the
            # bench circle's h≈40), so the velocity is first advanced to P's
            # own frame with the measured curvature.
            vel = self.vel + self.accel * self._vel_lag[:, None]
            # The acceleration is split into a TURN (perpendicular) and a
            # speed-change (parallel) component. The turn component drives a
            # coordinated-turn prediction — rotate the velocity at the
            # estimated turn rate ω = (v × a)/|v|² and integrate, the
            # standard CT motion model — which is EXACT for circular arcs,
            # where the quadratic Taylor model's cubic residual R·θ³/6 was
            # the horizon limiter (≈40 px at h=40 on the bench circle — the
            # wall the error-gated depth controller kept hitting). The
            # parallel component keeps its quadratic term. ω is clamped like
            # the curvature (noise on erratic motion must not be amplified
            # by long horizons; a bad aim is only a replay) and the model
            # decays to the plain quadratic as ω → 0.
            v2 = np.sum(vel * vel, axis=-1)  # [L]
            cross = vel[:, 0] * self.accel[:, 1] - vel[:, 1] * self.accel[:, 0]
            omega = np.where(v2 > 1e-6, cross / np.maximum(v2, 1e-9), 0.0)
            omega = np.clip(omega, -self.OMEGA_CLAMP, self.OMEGA_CLAMP)[:, None, None]
            vdota = np.sum(vel * self.accel, axis=-1)
            a_par = (
                np.where(v2 > 1e-6, vdota / np.maximum(v2, 1e-9), 0.0)[:, None]
                * vel
            )  # [L, 2] tangential acceleration
            th = omega * h  # [L, K, 1]
            # ∫₀ʰ R(ωs)·v ds — guarded small-ω limits (sinθ/ω → h,
            # (1-cosθ)/ω → ωh²/2 reproduce the quadratic model exactly)
            small = np.abs(th) < 1e-4
            with np.errstate(divide="ignore", invalid="ignore"):
                s_w = np.where(small, h, np.sin(th) / np.where(small, 1.0, omega))
                c_w = np.where(
                    small, 0.5 * omega * h * h,
                    (1.0 - np.cos(th)) / np.where(small, 1.0, omega),
                )
            vi = vel[:, None, 0:1]
            vj = vel[:, None, 1:2]
            # rotation convention: a = ω ẑ × v maps v=(i,j) to (-ωj, +ωi)
            turn = np.concatenate(
                [s_w * vi - c_w * vj, c_w * vi + s_w * vj], axis=-1
            )  # [L, K, 2]
            pred = self.P[:, None, :] + turn + 0.5 * a_par[:, None, :] * h * h
            return np.round(pred).astype(np.int64) - self.margin
        return np.broadcast_to(
            (self.P - self.margin)[:, None, :], (self.L, self.K, 2)
        )

    # -- validation ---------------------------------------------------------
    def _contained(self, pos_np, origins, valid):
        """Every window each lane's scan read must lie inside ITS frame's
        crop (reads past the TRUE frame edge hit the same mode-fill in both
        the crop scan and a full-frame scan). Frame ``i``'s window centers
        at the previous position (``P`` for frame 0), checked against
        ``origins[lane, i]``. The final position itself needs no check: it
        lies inside the last validated window by construction, and its OWN
        window is frame 0 of the NEXT chunk's validation — keeping the check
        per-window is also what guarantees a 1-frame rewind chunk at the
        exact ``P - margin`` origin can never fail (replay progress)."""
        for lane in range(self.L):
            k = int(valid[lane])
            if k == 0:
                continue
            abs_ = pos_np[lane, :k].astype(np.int64) + origins[lane, :k]
            seq = np.concatenate(
                [self.P[lane][None].astype(np.int64), abs_[: k - 1]]
            )
            o = origins[lane, :k]
            if not (
                (np.maximum(seq - self.rh, 0) >= o).all()
                and (
                    np.minimum(seq + self.rh, self.frame_max)
                    <= o + [self.ch - 1, self.cw - 1]
                ).all()
            ):
                return False
        return True

    # -- accept / replay / drain -------------------------------------------
    def _accept(self, pos_np, off_np, ent):
        origins, valid, tokens, buf = ent.origins, ent.valid, ent.tokens, ent.buf
        abs_pos = pos_np.astype(np.int64) + origins  # [L, K, 2]
        self.sink(abs_pos, valid, off_np)
        self.source.accept(tokens, valid, abs_pos, self.timer, ent.off)
        for lane in range(self.L):
            k = int(valid[lane])
            if k > 1:
                self._vel_ready = True
                new_vel = (abs_pos[lane, k - 1] - abs_pos[lane, 0]) / (k - 1)
                if self._last_k[lane] > 1:
                    # curvature from consecutive chunk secants (midpoints
                    # ~(k_prev+k)/2 frames apart), clamped — see ACCEL_CLAMP
                    gap = 0.5 * (self._last_k[lane] + k)
                    self.accel[lane] = np.clip(
                        (new_vel - self.vel[lane]) / gap,
                        -self.ACCEL_CLAMP, self.ACCEL_CLAMP,
                    )
                self.vel[lane] = new_vel
                self._last_k[lane] = k
                self._vel_lag[lane] = 0.5 * (k - 1)  # secant midpoint lag
            if k > 0:
                self.P[lane] = abs_pos[lane, k - 1]
        self.tracked += valid
        if self.auto_depth and self.mode == "predict" and not ent.blind:
            # blind entries (aimed before any velocity existed) miss by the
            # target's full speed*h — a property of the standing-still
            # probe, not of the speculation horizon; learning from them
            # collapsed a cold start's soft cap to 1 on any fast target
            self._update_depth_from_error(abs_pos, origins, valid)
        if buf is not None and len(self._free) < self._pool_max:
            self._free.append(buf)

    def _update_depth_from_error(self, abs_pos, origins, valid):
        """Prediction-error-aware depth control: every accepted chunk REVEALS
        how far the aim missed (each frame's crop was centered on its
        predicted position), so the controller can stop deepening BEFORE the
        error reaches the margin instead of paying a ~depth*K-frame replay
        to find out. Extrapolation error grows superlinearly with the
        staleness horizon (cubically for turning motion: the aim is
        quadratic), so the thresholds are conservative:

        - error > 80% of slack: one more chunk of staleness would likely
          escape — back the pipeline off a step and hold the cap there;
        - error > 45% of slack: hold (one depth step multiplies the horizon
          by ~(d+2)/(d+1) and the error by that CUBED — at 45% a single
          step can reach ~80%);
        - clean chunks below that: earn one cap step per
          CLEAN_RELAX_CHUNKS, so a transient (scene cut, startup) doesn't
          pin the clip shallow forever."""
        k_axis = valid.astype(np.int64)
        worst = 0.0
        for lane in range(self.L):
            k = int(k_axis[lane])
            if k == 0:
                continue
            pred_center = origins[lane, :k] + self.margin
            err = np.abs(abs_pos[lane, :k] - pred_center) / self._slack
            worst = max(worst, float(err.max()))
        if worst > 0.8:
            self._depth_soft_cap = max(1, min(self._depth_soft_cap,
                                              self.depth_cur - 1))
            self.depth_cur = min(self.depth_cur, self._depth_soft_cap)
            self._clean_since_replay = 0
        elif worst > 0.45:
            self._clean_since_replay = 0
        elif self._depth_soft_cap < self.depth_max and self._cap_wanted:
            self._clean_since_replay += 1
            if self._clean_since_replay >= self._relax_need:
                self._clean_since_replay = 0
                self._cap_wanted = False
                self._depth_soft_cap += 1

    def _replay(self, entries):
        """Mispredict: push every undrained entry (oldest first) onto the
        rewind queue; the main loop re-dispatches them THROUGH the pipeline
        (re-cropped from retained frames at a fresh aim) instead of paying
        one synchronous device round trip per in-flight chunk — on the
        tunnel-RPC link a depth-7 synchronous replay cost ~0.4 s (profiled),
        ~25% of a bench pass. Progress stays guaranteed: the first rewind
        entry re-dispatches with nothing in flight, where :meth:`_aim` puts
        frame 0's crop EXACTLY at ``P - margin`` — frame 0's window (centered
        at ``P``) is then provably contained since ``margin >= radii +
        kernel apron``. If a later frame of that exact chunk still escapes
        (fast/erratic motion vs the slim prediction-error margin), the chunk
        is SPLIT in half (:meth:`_split_exact`) down to the always-contained
        1-frame floor, so every replay cycle accepts at least one frame.
        Speculative re-entries are containment-validated like any chunk (a
        cascade just replays the shrunken tail)."""
        global replay_count
        replay_count += 1
        if self.auto_depth:
            # hysteresis: the depth that just mispredicted is too deep for
            # this motion — hold the re-ramp BELOW it until clean chunks
            # earn one step back. The backoff alone oscillates (blocked
            # drains ramp right back to the failing depth); the soft cap
            # converges on the deepest depth the motion tolerates. A replay
            # AT the cap means a cap-relax exploration failed: double the
            # clean-chunk price of the next exploration (bounded) so a clip
            # that keeps proving the horizon bad stops being probed
            if self.depth_cur >= self._depth_soft_cap:
                self._relax_need = min(self._relax_need * 2,
                                       8 * self.CLEAN_RELAX_CHUNKS)
            self._depth_soft_cap = max(1, self.depth_cur - 1)
            self._clean_since_replay = 0
            # multiplicative backoff: this horizon was too long for the
            # motion, but a full reset to 1 re-pays ~depth blocked drains
            # of ramp after EVERY replay; halving converges on sustained
            # erratic motion while keeping smooth-path replays cheap
            self.depth_cur = max(1, self.depth_cur // 2)
        # the curvature estimate just failed its test: zero it AND the
        # secant history, so accel stays off until two fresh post-replay
        # chunks establish a new pair (without clearing _last_k, the very
        # first replayed _accept would recompute accel from the same motion)
        self.accel[:] = 0.0
        self._last_k[:] = 0
        self.engine.reset()  # the device chain past this point is invalid
        # PREPEND: a re-dispatched chunk can fail containment while the
        # rewind queue still holds LATER chunks from the same cascade —
        # appending would re-dispatch those later chunks first, pairing
        # their valid counts/origins with earlier frames (the retained ring
        # serves frames strictly in order). Frame order must be preserved.
        self._rewind.extendleft(reversed(entries))

    def _split_exact(self, ent):
        """An EXACT-origin rewind chunk still escaped its crops: halve it.

        Frame 0 of an exact re-dispatch is provably contained (window
        centered in its crop), so halving terminates at an accepted 1-frame
        chunk — the progress floor that replaces the old worst-case ``K*r``
        margin term. Returns the sub-entries (buffer ownership stays with
        the first; the second allocates lazily at dispatch)."""
        k = int(ent.valid.max())
        if k <= 1:
            # impossible by construction (frame 0 of an exact dispatch is
            # centered in its crop; margin >= radii + apron) — fail loudly
            # rather than replay-loop forever if the invariant ever breaks
            raise RuntimeError("1-frame exact rewind chunk failed containment")
        j = max(1, k // 2)
        v1 = np.minimum(ent.valid, j)
        v2 = ent.valid - v1
        first = _Pending(None, ent.origins, v1, ent.tokens, ent.buf,
                         off=ent.off)
        if v2.max() <= 0:
            return [first]
        return [first, _Pending(None, ent.origins, v2, ent.tokens, None,
                                off=ent.off + v1)]

    def _dispatch_rewind(self):
        """Re-dispatch the oldest replayed chunk through the pipeline.

        Its frames are NOT the oldest retained while earlier re-dispatched
        chunks are still in flight (unaccepted, hence unreleased), so the
        source gets their per-lane frame counts as the ``base`` offset into
        the retained window."""
        ent = self._rewind.popleft()
        exact = not self._pending  # frame-0 aim degenerates to P - margin
        origins = self._aim()
        base = np.zeros(self.L, np.int64)
        for p in self._pending:
            base += p.valid
        # buffer-less split sub-entries allocate lazily when the pool is dry
        # (the pool cap in _accept bounds the growth)
        buf = self._free.pop() if self._free else np.empty(
            (self.L, self.K, self.ch, self.cw), np.uint8
        )
        self.source.recrop(ent.tokens, ent.valid, origins, buf, self.timer,
                           base, ent.off)
        handle = self.engine.dispatch(buf, origins, self.P, ent.valid)
        self._pending.append(_Pending(handle, origins, ent.valid, ent.tokens,
                                      buf, exact=exact, off=ent.off))
        if ent.buf is not None and len(self._free) < self._pool_max:
            self._free.append(ent.buf)

    def _drain_one(self):
        entry = self._pending.popleft()
        with self.timer.section("drain"):
            t0 = time.perf_counter()
            pos_np, off_np = self.engine.to_host(entry.handle)
            blocked = time.perf_counter() - t0
        if self.auto_depth and blocked > AUTO_DRAIN_BLOCK_S:
            if self.depth_cur < min(self.depth_max, self._depth_soft_cap):
                # the lagged download still blocked: the pipeline isn't deep
                # enough to hide the round trip — add a chunk of slack
                # (bounded by the replay-hysteresis soft cap: a depth that
                # just mispredicted is not re-entered until earned back)
                self.depth_cur += 1
            else:
                # a SUBSEQUENT blocked drain with the depth already at its
                # ceiling (max or replay-learned soft cap): the per-chunk
                # RPC round trip itself is the residual — authorize a
                # cap-relax exploration and coalesce dispatches (group cap
                # (depth+1)//2 keeps two groups in flight: overlap, not
                # batching). Kept sequential with deepening (else-branch):
                # growing the group in the same event that deepened would
                # coalesce before the added depth had a chance to hide the
                # round trip.
                if self._depth_soft_cap < self.depth_max:
                    self._cap_wanted = True
                if self._grow_groups:
                    grow = getattr(self.engine, "grow_group", None)  # duck-typed
                    if grow is not None:
                        grow(max(1, (self.depth_cur + 1) // 2))
        if self.mode == "predict" and not self._contained(
            pos_np, entry.origins, entry.valid
        ):
            head = self._split_exact(entry) if entry.exact else [entry]
            rest = list(self._pending)
            self._pending.clear()
            self._replay(head + rest)
            return
        self._accept(pos_np, off_np, entry)

    # -- main loop ----------------------------------------------------------
    def run(self, pos0_abs, n_rest: int):
        """Track up to ``n_rest`` frames per lane from absolute start
        positions ``pos0_abs [L, 2]``. Returns per-lane tracked counts."""
        self.P = np.asarray(pos0_abs, np.int64).reshape(self.L, 2).copy()
        self.vel = np.zeros((self.L, 2))
        self.accel = np.zeros((self.L, 2))
        self._last_k = np.zeros(self.L, np.int64)
        self._vel_lag = np.zeros(self.L)
        self._vel_ready = False
        self.tracked = np.zeros(self.L, np.int64)
        self.engine.reset()
        # warm-start the converged dispatch-group size (memoized with the
        # depth): adaptive growth needs several blocked drains to rediscover
        # it each run, which on short clips costs the whole ramp (measured:
        # group 2 from the start is ~+60 fps at the bench geometry). Applied
        # AFTER reset() (which zeroes group_target back to 1), clamped by
        # grow_group's overlap bound; replays still reset to 1 within a run.
        if (self.auto_depth and self._memo_group > 1
                and not os.environ.get("PAWS_DISPATCH_GROUP")
                and getattr(self.engine, "_group_allowed", False)):
            self.engine.group_target = min(
                self._memo_group, max(1, (self.depth_cur + 1) // 2),
                self.engine.GROUP_MAX,
            )
        try:
            remaining = n_rest
            eof = False
            while True:
                # evidence-proportional speculation horizon (auto depth
                # only — a user-PINNED pipeline_depth is honored as asked):
                # until a velocity estimate exists every aim is a
                # standing-still guess (drain the probe synchronously), and
                # a velocity measured over N frames says nothing about where
                # the target is 5N frames out — so the in-flight depth may
                # not exceed the chunks of history observed. Without this a
                # warm-started (memoized) pipeline runs 30+ frames ahead on
                # a 2-frame probe secant and pays a deterministic
                # start-of-clip replay (profiled on the bench circle: aimed
                # from the probe at horizon ~25, miss 55 px vs 40 slack).
                if self.mode != "predict" or not self.auto_depth:
                    depth_eff = self.depth_cur
                elif not self._vel_ready:
                    depth_eff = 0
                else:
                    evidence = int(self.tracked.max()) // max(self.K, 1)
                    depth_eff = min(self.depth_cur, max(1, evidence))
                while len(self._pending) > depth_eff:
                    self._drain_one()
                if self._ready is not None:
                    # finished results cost nothing to take now and freshen
                    # the aim (see _ready above); a replay inside _drain_one
                    # clears _pending, which also exits this loop
                    while self._pending and self._ready(self._pending[0].handle):
                        self._drain_one()
                if self._rewind:
                    # replayed chunks re-enter ahead of any fresh decode so
                    # frame order (and the sink/accept order) is preserved
                    self._dispatch_rewind()
                    continue
                if remaining <= 0 or eof:
                    if self._pending:
                        # drain one at a time: a containment failure here
                        # refills the rewind queue, which the next loop
                        # iteration re-dispatches
                        self._drain_one()
                        continue
                    break
                origins = self._aim()
                buf = self._free.pop() if self._free else np.empty(
                    (self.L, self.K, self.ch, self.cw), np.uint8
                )
                take = remaining
                if self.mode == "predict" and not self._vel_ready:
                    # no velocity estimate yet (first chunk of a run): a
                    # full-K chunk aimed at a standing-still prediction
                    # escapes the slim margin for anything moving faster
                    # than slack/K px/frame — probe short, learn velocity,
                    # then resume full chunks (same buffers/programs: the
                    # scan always runs K rows, extra rows are discarded)
                    take = min(remaining, max(2, self.K // 4))
                got = self.source.acquire(take, origins, buf, self.timer)
                if got is None:
                    self._free.append(buf)
                    eof = True
                    continue
                tokens, valid = got
                handle = self.engine.dispatch(buf, origins, self.P, valid)
                self._pending.append(
                    _Pending(handle, origins, valid, tokens, buf,
                             blind=not self._vel_ready)
                )
                remaining -= int(valid.max())
            if self.auto_depth:
                # record only on clean completion (an exception leaves the
                # converged state unknown); a run that ended just after a
                # replay records 1 — conservative, it just re-ramps
                _AUTO_DEPTH_MEMO[self._memo_key] = (
                    self.depth_cur, self._depth_soft_cap,
                    getattr(self.engine, "group_target", 1) or 1,
                )
        finally:
            close = getattr(self.engine, "close", None)
            if close is not None:  # duck-typed engines (bench hostceil stage)
                close()
        return self.tracked


# ---------------------------------------------------------------------------
# Frontends
# ---------------------------------------------------------------------------


def run_roi_pipeline(
    src,
    spec,
    pos0_abs: np.ndarray,
    fill: int,
    n_rest: int,
    *,
    roi_frames: int,
    depth,
    engine: str,
    subpixel: bool,
    dia,
    timer,
    native_roi: bool,
    prefetchers: list,
    speculate: str = "predict",
    progress=None,
    auto_cap: int | None = None,
):
    """Track ``n_rest`` frames of ``src`` by pipelined ROI streaming
    (single video, single target — :class:`SpeculativePipeline` with L=1 and
    the unbatched measured engine).

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
    K = roi_frames
    if depth == "auto":
        depth_max = auto_depth_cap(spec.frame_shape, K)
        if auto_cap is not None:
            depth_max = min(depth_max, auto_cap)
    else:
        depth_max = depth
    mode = speculate if depth_max > 0 else "contain"
    ch, cw, margin = roi_geometry(spec, K, depth_max, mode)
    roi_spec = make_spec((ch, cw), spec.window_size, spec.target_width, spec.darker_target)
    base = tracker_fns(roi_spec)
    if engine == "auto":
        # measured per-environment choice, persisted; also a hardware parity
        # pin (the measurement asserts pallas == xla positions on this chip;
        # subpixel additionally checks offset closeness)
        engine, _ = pick_bounded_engine(roi_spec, K, fill, subpixel=subpixel)
    if engine == "pallas":
        from .ops.pallas_tracker import pallas_scan_fn

        pal = pallas_scan_fn(roi_spec, bounded=True, subpixel=subpixel)
        scan_first, scan_chain = pal, make_chained(pal)
    elif subpixel:
        scan_first, scan_chain = base.scan_sub, make_chained(base.scan_sub)
    else:
        scan_first, scan_chain = base.scan_bounded, make_chained(base.scan_bounded)

    positions: list[np.ndarray] = []
    offsets: list[np.ndarray] = []

    def sink(abs_pos, valid, off_np):
        k = int(valid[0])
        positions.append(abs_pos[0, :k])
        if off_np is not None:
            offsets.append(off_np[0, :k])
        if progress is not None:
            progress(sum(len(p) for p in positions), n_rest)

    pipe = SpeculativePipeline(
        L=1,
        K=K,
        crop_shape=(ch, cw),
        margin=margin,
        spec=spec,
        mode=mode,
        depth=depth,
        auto_cap=depth_max if depth == "auto" else None,
        engine=_SingleEngine(scan_first, scan_chain, (ch, cw), spec.frame_shape,
                             fill, subpixel, timer),
        source=SingleVideoSource(src, K=K, ch=ch, cw=cw, fill=fill, dia=dia,
                                 mode=mode, native_roi=native_roi, depth=depth_max,
                                 n_rest=n_rest, prefetchers=prefetchers),
        sink=sink,
        timer=timer,
    )
    tracked = pipe.run(np.asarray(pos0_abs).reshape(1, 2), n_rest)
    return positions, offsets, int(tracked[0])


@functools.lru_cache(maxsize=256)
def make_chained_full(scan):
    """Chained wrapper for FULL-FRAME scans ``fn(frames, pos0, fill)``
    (same memoization rationale as :func:`make_chained`)."""
    import jax
    import jax.numpy as jnp

    def chained(frames, prev_all, fill):
        return scan(frames, prev_all[-1].astype(jnp.int32), fill)

    return jax.jit(chained)


@functools.lru_cache(maxsize=256)
def make_super_full(scan, S: int, subpixel: bool):
    """Full-frame analog of :func:`make_super_chain`: S chained chunk scans
    in one jitted program (one tunnel RPC instead of S)."""
    import jax
    import jax.numpy as jnp

    inner = getattr(scan, "__wrapped__", scan)

    def sup(chunks, prev_all, fill):
        outs = []
        p = prev_all[-1]
        for s in range(S):
            out = inner(chunks[s], p.astype(jnp.int32), fill)
            outs.append(out)
            p = out[0][-1] if subpixel else out[-1]
        return outs

    return jax.jit(sup)


class _FullFrameEngine(_GroupDispatchBase):
    """Engine adapter for the full-frame path: chunks are whole frames, so
    there are no origins/bounds — the chain state is just the previous
    chunk's (lazy) positions. Group dispatch via :class:`_GroupDispatchBase`
    (super-programs from :func:`make_super_full`)."""

    def __init__(self, scan, pos0_abs, fill, subpixel, timer):
        import jax.numpy as jnp

        self._jnp = jnp
        self.scan = scan
        self.scan_chain = make_chained_full(scan)
        self.pos0 = jnp.asarray(np.asarray(pos0_abs, np.int32))
        self.fill_dev = np.uint8(fill)
        self.subpixel = subpixel
        self.timer = timer
        self._init_grouping()

    def dispatch(self, chunk_in):
        self._maybe_prewarm(chunk_in.shape)
        xfut = self._disp.submit_stage(self._jnp.asarray, chunk_in)
        return self._stage_entry((xfut, _GroupHandle()))

    def _prewarm_supers(self, buf_shape):
        import jax

        chunk = self._jnp.asarray(np.zeros(buf_shape, np.uint8))
        prev = self._jnp.asarray(np.zeros((buf_shape[0], 2), np.int32))
        for S in range(2, self.GROUP_MAX + 1):
            sup = make_super_full(self.scan, S, self.subpixel)
            jax.block_until_ready(sup((chunk,) * S, prev, self.fill_dev))

    def _finish(self, out):
        if self.subpixel:
            out, off = out
            _to_host_async(out, off)
        else:
            off = None
            _to_host_async(out)
        self._prev = out
        return out, off

    def _run_first(self, entry):
        with self.timer.section("device"):
            return self._finish(self.scan(entry[0].result(), self.pos0, self.fill_dev))

    def _run_chain(self, entry):
        with self.timer.section("device"):
            return self._finish(
                self.scan_chain(entry[0].result(), self._prev, self.fill_dev)
            )

    def _run_super(self, rest):
        sup = make_super_full(self.scan, len(rest), self.subpixel)
        chunks = tuple(e[0].result() for e in rest)
        with self.timer.section("device"):
            outs = sup(chunks, self._prev, self.fill_dev)
        return [self._finish(out) for out in outs]

    def to_host(self, handle):
        out, off = self._materialize(handle)
        return np.asarray(out), (None if off is None else np.asarray(off))


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
    progress=None,
):
    """Full-frame streaming with the same de-serialization as the ROI path:
    chunk scans chain their start positions on device and the host downloads
    positions ``depth`` chunks behind (no origins, no speculation — frames are
    whole, so results are trivially identical to the synchronous loop).
    Dispatch (the full-frame H2D is 2 MB/frame at 1080p) runs on the same
    FIFO worker the engine adapters use — see :class:`_SerialDispatcher`;
    group dispatch adapts on blocked drains exactly as in the ROI engines,
    capped at (depth+1)//2 so two groups stay in flight (overlap — without
    it grouping serializes decode against the device and LOSES, measured)."""
    positions: list[np.ndarray] = []
    offsets: list[np.ndarray] = []
    tracked = 0
    pending: deque = deque()  # (_GroupHandle, k, frames_for_dia)

    from .diagnose import Dont

    keep = not isinstance(dia, Dont)
    eng = _FullFrameEngine(scan, pos0_abs, fill, subpixel, timer)
    grow_groups = _grouping_pays()
    group_cap = max(1, (depth + 1) // 2)
    drained = 0

    def drain_one():
        nonlocal tracked, drained
        handle, k, frames = pending.popleft()
        with timer.section("drain"):
            t0 = time.perf_counter()
            # to_host materializes the result — that is where the link wait
            # actually lands (the group task returns lazy device arrays), so
            # it belongs inside the blocked window
            out_np, off_np = eng.to_host(handle)
            blocked = time.perf_counter() - t0
        drained += 1
        # warm-up exclusion: the first drains block on XLA compiles, not the
        # link RPC — growing on them would compile super-programs mid-stream
        # on a healthy link (the ROI controller gets this for free: depth
        # must exhaust before its group grows)
        if grow_groups and drained > depth + 2 and blocked > AUTO_DRAIN_BLOCK_S:
            eng.grow_group(group_cap)  # the RPC round trip is the residual
        positions.append(out_np[:k])
        if off_np is not None:
            offsets.append(off_np[:k])
        if keep:
            with timer.section("diagnose"):
                for i in range(k):
                    dia(frames[i], out_np[i])
        # recycle only at drain: joining this chunk's future implies its
        # jnp transfer (and every earlier task) completed, so the producer
        # may refill the buffer now
        prefetch.recycle(frames)
        tracked += k
        if progress is not None:
            progress(tracked, n_rest)

    from .api import padded_chunks

    prefetch = ChunkPrefetcher(src, chunk_size, max_frames=n_rest)
    prefetchers.append(prefetch)
    eager = (os.environ.get("PAWS_EAGER_DRAIN", "1") != "0")
    try:
        for chunk, chunk_in, k in padded_chunks(prefetch, chunk_size):
            while len(pending) > depth:
                drain_one()
            if eager:
                # finished results cost nothing to take now (frees the
                # prefetcher's frame buffers sooner) — results identical,
                # drain order stays FIFO
                while pending and eng.ready(pending[0][0]):
                    drain_one()
            pending.append((eng.dispatch(chunk_in), k, chunk))
        while pending:
            drain_one()
    finally:
        eng.close()
    return positions, offsets, tracked


def run_multi_roi_pipeline(
    src,
    spec,
    pos0_abs: np.ndarray,
    fill: int,
    n_rest: int,
    *,
    roi_frames: int,
    depth,
    timer,
    prefetchers: list,
    engine: str = "auto",
    subpixel: bool = False,
    dia=None,
    progress=None,
    auto_cap: int | None = None,
):
    """Speculative pipelined ROI streaming for N targets in ONE stream
    (:class:`SpeculativePipeline` with L=N and :class:`FanoutSource`): each
    decoded frame yields N drift-bounded crops (bounded scans batched over the
    target axis), aimed per target by velocity prediction and validated /
    replayed exactly like the single-target pipeline. With the native decoder
    the crops come from C++ ``recrop`` — full frames never enter Python.

    ``engine="auto"`` makes the measured pallas/xla choice for the batched
    bounded scan (grid ``(N, K)`` fused kernel vs vmapped XLA); ``subpixel``
    forces the XLA sub-pixel scan and additionally returns offset arrays.

    Returns ``(position_arrays, offset_arrays, frames_tracked)``; each
    position array is ``[k, N, 2]`` absolute int (offsets ``[k, N, 2]``
    float, empty list unless ``subpixel``).
    """
    import jax.numpy as jnp

    from .parallel.mesh import ShardedBatchTracker

    K = roi_frames
    if depth == "auto":
        depth_max = auto_depth_cap(spec.frame_shape, roi_frames)
        if auto_cap is not None:
            depth_max = min(depth_max, auto_cap)
    else:
        depth_max = depth
    mode = "predict" if depth_max > 0 else "contain"
    ch, cw, margin = roi_geometry(spec, K, depth_max, mode)
    roi_spec = make_spec((ch, cw), spec.window_size, spec.target_width, spec.darker_target)
    N = int(pos0_abs.shape[0])
    tracker = ShardedBatchTracker(roi_spec, None)
    scan_bounded = _select_batched_bounded(tracker, roi_spec, K, N, fill, engine,
                                           subpixel=subpixel)

    positions: list[np.ndarray] = []
    offsets: list[np.ndarray] = []

    def sink(abs_pos, valid, off_np):
        k = int(valid[0])  # one stream: all lanes share the chunk length
        positions.append(np.transpose(abs_pos[:, :k], (1, 0, 2)))  # [k, N, 2]
        if off_np is not None:
            offsets.append(np.transpose(off_np[:, :k], (1, 0, 2)))
        if progress is not None:
            progress(sum(p.shape[0] for p in positions), n_rest)

    pipe = SpeculativePipeline(
        L=N,
        K=K,
        crop_shape=(ch, cw),
        margin=margin,
        spec=spec,
        mode=mode,
        depth=depth,
        auto_cap=depth_max if depth == "auto" else None,
        engine=_BatchedEngine(scan_bounded, (ch, cw), spec.frame_shape,
                              jnp.asarray(np.full(N, fill, np.uint8)), subpixel, timer),
        source=FanoutSource(src, N=N, K=K, ch=ch, cw=cw, fill=fill, mode=mode,
                            depth=depth_max, n_rest=n_rest, prefetchers=prefetchers,
                            dia=dia),
        sink=sink,
        timer=timer,
    )
    tracked = pipe.run(np.asarray(pos0_abs, np.int64), n_rest)
    return positions, offsets, int(tracked[0])
