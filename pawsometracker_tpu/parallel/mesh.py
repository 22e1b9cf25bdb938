"""Multi-chip scale-out over a ``jax.sharding.Mesh``.

The reference's only parallelism is intra-frame CPU multithreading of the FIR
filter (reference: src/PawsomeTracker.jl:57). On TPU the equivalent axes are:

- **data** — many videos (or many search windows) tracked per step: the batch
  axis of ``[B, T, H, W]`` frame chunks is sharded across chips; each chip runs
  its videos' scans independently (no cross-chip traffic in steady state, so
  scaling is embarrassingly linear over ICI).
- **space** — for the full-frame global-detection pass, the frame's row axis is
  sharded; XLA's SPMD partitioner inserts the halo exchanges the valid DoG
  correlation needs across shard boundaries (collectives ride ICI).

The per-video scan itself is inherently sequential (each frame's window depends
on the previous position — SURVEY.md §2.4), so single-video latency is bound to
one core; throughput comes from batching.
"""

from __future__ import annotations




import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.dog_tracker import TrackerSpec, autodetect_spec, tracker_fns
from ..ops.dog_kernel import dog_kernel_separable

__all__ = [
    "make_mesh",
    "batch_sharding",
    "ShardedBatchTracker",
    "sharded_pallas_bounded",
    "global_detect_batch",
    "global_detect_peaks",
]


def make_mesh(n_devices: int | None = None, *, space: int = 1, devices=None) -> Mesh:
    """A ``(data, space)`` mesh over the first ``n_devices`` devices.

    ``space`` divides ``n_devices``; the data axis gets the rest. With
    ``space=1`` (default) this is a pure data-parallel mesh.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % space != 0:
        raise ValueError(f"space={space} must divide n_devices={n_devices}")
    arr = np.array(devices[:n_devices]).reshape(n_devices // space, space)
    return Mesh(arr, ("data", "space"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis on ``data``; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def _batch_frame_response(spec: TrackerSpec):
    """Shared whole-frame DoG response: ``fn(frames_u8 [B,H,W], fills [B])
    -> float32 [B,H,W]`` — pad with each frame's mode fill, then the
    separable HIGHEST-precision correlation with the signed kernel. Both
    whole-frame detectors build on this so they can never disagree.

    Deliberately NOT built on :func:`..ops.filters.separable_correlate_valid`:
    that helper is single-patch; here one batched matmul pair per gaussian
    covers the whole [B, H, W] stack. Same banded-matmul formulation as the
    helper — a 1-channel conv lowers catastrophically on TPU (minutes of
    compile for a 1080p frame; see filters.separable_correlate_valid). Under
    a space-sharded mesh the row contraction gathers the row axis instead of
    a conv halo exchange — acceptable for a once-per-video detection. Any
    semantics change to the filter (precision, tap order) must be mirrored
    here — the parity is pinned by the detector-vs-tracker tests."""
    from ..ops.filters import _banded

    gc_np, gs_np, direction, L = dog_kernel_separable(spec.sigma, spec.darker_target)
    gc = jnp.asarray(gc_np, jnp.float32)
    gs = jnp.asarray(gs_np, jnp.float32)
    half = L // 2

    def response(frames, fills):
        x = frames.astype(jnp.float32)  # [B, H, W]
        fill = fills.astype(jnp.float32)[:, None, None]
        x = jnp.pad(x, ((0, 0), (half, half), (half, half)))  # constant 0, fixed below
        # restore the constant fill on the apron (jnp.pad with per-batch
        # constants isn't expressible directly)
        mask = jnp.pad(
            jnp.ones((frames.shape[1], frames.shape[2]), jnp.float32),
            ((half, half), (half, half)),
        )
        x = x * mask + fill * (1.0 - mask)

        def corr(g):
            br = _banded(g, x.shape[1])  # [H, H+L-1]
            bc = _banded(g, x.shape[2])  # [W, W+L-1]
            r = jnp.matmul(br, x, precision=jax.lax.Precision.HIGHEST)
            return jnp.matmul(r, bc.T, precision=jax.lax.Precision.HIGHEST)

        return direction * (corr(gc) - corr(gs))  # [B, H, W]

    return response


@functools.lru_cache(maxsize=128)
def global_detect_batch(spec: TrackerSpec, mesh: Mesh | None = None):
    """Whole-frame target detection, batched and (optionally) spatially sharded.

    Framework extension beyond the reference's quarter-frame auto-detect
    (reference: src/PawsomeTracker.jl:99-107): computes the DoG response over
    the ENTIRE frame and returns the argmax per batch element. With a mesh, the
    frame row axis is sharded over ``space`` and the batch over ``data``; XLA
    inserts halo exchanges for the valid correlation.

    Returns a jitted ``fn(frames_u8 [B, H, W], fills_u8 [B]) -> int32 [B, 2]``.
    """
    H, W = spec.frame_shape
    response = _batch_frame_response(spec)

    def detect(frames, fills):
        resp = response(frames, fills)  # [B, H, W]
        # column-major first-max to match the tracker's tie-break
        k = jnp.argmax(resp.transpose(0, 2, 1).reshape(resp.shape[0], -1), axis=1)
        col = k // H
        row = k % H
        return jnp.stack([row, col], axis=1).astype(jnp.int32)

    if mesh is None:
        return jax.jit(detect)
    in_sh = (
        NamedSharding(mesh, P("data", "space", None)),
        NamedSharding(mesh, P("data")),
    )
    out_sh = NamedSharding(mesh, P("data", None))
    return jax.jit(detect, in_shardings=in_sh, out_shardings=out_sh)


@functools.lru_cache(maxsize=128)
def global_detect_peaks(spec: TrackerSpec, n_targets: int, min_distance: int | None = None):
    """Top-``n_targets`` DoG-response peaks in ONE frame, with non-maximum
    suppression — multi-target auto-detection (framework extension; the
    reference auto-detects a single target in a quarter-frame window,
    src/PawsomeTracker.jl:99-107).

    Peaks are returned strongest-first; each peak suppresses a disk of radius
    ``min_distance`` (default: the search-window extent, so two targets are
    never the same blob). Ties break column-major like the tracker. If
    suppression exhausts the frame before N peaks are found, the remaining
    entries REPEAT the last valid peak — callers (track_multi) reject
    duplicate peaks with a clear error instead of seeding bogus trackers.

    Returns a jitted ``fn(frame_u8 [H, W], fill_u8) -> int32 [n_targets, 2]``.
    """
    from ..ops.filters import argmax_colmajor

    H, W = spec.frame_shape
    N = int(n_targets)
    if min_distance is None:
        min_distance = max(2 * spec.radii[0] + 1, 2 * spec.radii[1] + 1)
    r2 = float(min_distance) ** 2
    response = _batch_frame_response(spec)

    def detect(frame_u8, fill_u8):
        resp = response(frame_u8[None], jnp.asarray(fill_u8)[None])[0]  # [H, W]
        ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

        def body(k, carry):
            resp_c, out = carry
            idx = argmax_colmajor(resp_c)
            # suppression exhausted the frame: repeat the previous peak (the
            # caller detects duplicates) instead of argmaxing an all -inf map
            exhausted = ~jnp.isfinite(resp_c[idx[0], idx[1]]) & (k > 0)
            idx = jnp.where(exhausted, out[jnp.maximum(k - 1, 0)], idx)
            out = out.at[k].set(idx)
            hit = ((ii - idx[0]) ** 2 + (jj - idx[1]) ** 2).astype(jnp.float32) <= r2
            resp_c = jnp.where(hit, -jnp.inf, resp_c)
            return resp_c, out

        _, out = jax.lax.fori_loop(0, N, body, (resp, jnp.zeros((N, 2), jnp.int32)))
        return out

    return jax.jit(detect)


@functools.lru_cache(maxsize=128)
def sharded_pallas_bounded(spec: TrackerSpec, mesh: Mesh, *, interpret: bool = False,
                           subpixel: bool = False):
    """The fused Pallas bounded scan under a device mesh: ``shard_map`` over
    the ``data`` axis so EACH chip runs the ``grid=(B/chips, T)`` fused kernel
    on its shard of the batch — the multi-chip path gets the same measured
    engine as single-chip instead of falling back to vmapped XLA.

    The batch axis must divide the mesh's ``data`` extent (callers fall back
    to the vmapped XLA scan otherwise). Signature matches the batched bounded
    scan: ``fn(frames [B,T,ch,cw], pos0 [B,2], fills [B], deltas [B,T,2],
    lo [B,T,2], hi [B,T,2]) -> positions int32 [B,T,2]`` (per-frame crop
    origins: deltas rebase the carried position between consecutive frame
    crops, lo/hi clamp per frame). ``interpret=True`` runs the kernel in
    Pallas interpret mode (used by the CPU-mesh equality tests).
    """
    from ..ops.pallas_tracker import pallas_scan_fn

    pal = pallas_scan_fn(spec, batched=True, bounded=True, interpret=interpret,
                         subpixel=subpixel)
    out_specs = P("data", None, None)
    if subpixel:
        out_specs = (out_specs, out_specs)  # (positions, parabolic offsets)
    fn = jax.shard_map(
        pal,
        mesh=mesh,
        in_specs=(
            P("data", None, None, None),  # frames [B, T, ch, cw]
            P("data", None),  # pos0 [B, 2]
            P("data"),  # fills [B]
            P("data", None, None),  # deltas [B, T, 2]
            P("data", None, None),  # lo [B, T, 2]
            P("data", None, None),  # hi [B, T, 2]
        ),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=512)
def _cached_vmap_jit(fn, in_shardings=None, out_shardings=None):
    """Shared ``jax.jit(jax.vmap(fn))`` keyed on the underlying function (and
    optional shardings). ``tracker_fns`` is lru-cached per spec, so the jit —
    and its XLA executable — is built once per (spec, shardings) instead of
    once per :class:`ShardedBatchTracker` instance; without this every
    ``track_batch``/``track_multi`` call paid multi-second XLA recompiles of
    the batched scan inside the streaming loop."""
    f = jax.vmap(_unwrap(fn))
    if in_shardings is None:
        return jax.jit(f)
    return jax.jit(f, in_shardings=in_shardings, out_shardings=out_shardings)


class ShardedBatchTracker:
    """Batch-of-videos tracking engine, sharded over a device mesh.

    ``snap``/``scan`` mirror :class:`~..models.dog_tracker.TrackerFns` batched
    forms but with explicit shardings so pjit distributes videos across chips.
    """

    def __init__(self, spec: TrackerSpec, mesh: Mesh | None = None, engine: str = "auto"):
        self.spec = spec
        self.mesh = mesh
        fns = tracker_fns(spec)
        det = tracker_fns(autodetect_spec(spec))
        if mesh is not None and engine == "pallas":
            # the fused kernel under a mesh is a DIFFERENT code path
            # (sharded_pallas_bounded, selected by measurement in the ROI
            # pipeline) — accepting the flag here would silently run
            # vmapped XLA while the caller believes pallas was selected
            raise ValueError(
                "engine='pallas' is not supported with a mesh on "
                "ShardedBatchTracker; the fused sharded engine is selected "
                "by measurement in the ROI pipeline (engine='auto')"
            )
        if mesh is None and engine == "pallas" and jax.default_backend() != "tpu":
            # jit is lazy: without this, an explicit pallas request on a
            # non-TPU backend only fails later as a cryptic Mosaic compile
            # error at the first scan() call
            raise ValueError(
                "engine='pallas' requires a TPU backend (the fused kernel "
                "compiles via Mosaic); use engine='auto' or 'xla'"
            )
        if mesh is None:
            self.snap = fns.snap_batch
            self.snap_detect = det.snap_batch
            self.scan = fns.scan_batch
            self.scan_bounded = _cached_vmap_jit(fns.scan_bounded)
            # XLA sub-pixel variants (the fused bounded+subpixel Pallas
            # alternative is selected by measurement in the ROI pipelines —
            # pipeline._select_batched_bounded — these are the fallback/oracle:
            # the response around the argmax, which the fused kernel discards)
            self.scan_sub = _cached_vmap_jit(fns.scan_sub)
            self.snap_sub = _cached_vmap_jit(fns.snap_sub)
            self.snap_detect_sub = _cached_vmap_jit(det.snap_sub)
            if engine == "pallas" or (engine == "auto" and jax.default_backend() == "tpu"):
                # single-device batch: the fused kernel scans all videos in one
                # launch (grid (B, T)); per-video fills supported
                try:
                    from ..ops.pallas_tracker import pallas_scan_fn

                    self.scan = pallas_scan_fn(spec, batched=True)
                except Exception:
                    if engine == "pallas":
                        raise
        else:
            frames_sh = NamedSharding(mesh, P("data", None, None))
            chunk_sh = NamedSharding(mesh, P("data", None, None, None))
            vec_sh = NamedSharding(mesh, P("data"))
            pos_sh = NamedSharding(mesh, P("data", None))
            tpos_sh = NamedSharding(mesh, P("data", None, None))

            self.snap = _cached_vmap_jit(fns.snap, (frames_sh, pos_sh, vec_sh), pos_sh)
            self.snap_detect = _cached_vmap_jit(
                det.snap, (frames_sh, pos_sh, vec_sh), pos_sh
            )
            self.scan = _cached_vmap_jit(fns.scan, (chunk_sh, pos_sh, vec_sh), tpos_sh)
            self.scan_bounded = _cached_vmap_jit(
                fns.scan_bounded,
                (chunk_sh, pos_sh, vec_sh, tpos_sh, tpos_sh, tpos_sh),
                tpos_sh,
            )
            self.scan_sub = _cached_vmap_jit(
                fns.scan_sub,
                (chunk_sh, pos_sh, vec_sh, tpos_sh, tpos_sh, tpos_sh),
                (tpos_sh, tpos_sh),
            )
            self.snap_sub = _cached_vmap_jit(
                fns.snap_sub, (frames_sh, pos_sh, vec_sh), (pos_sh, pos_sh)
            )
            self.snap_detect_sub = _cached_vmap_jit(
                det.snap_sub, (frames_sh, pos_sh, vec_sh), (pos_sh, pos_sh)
            )

    def shard_chunk(self, chunk: np.ndarray):
        """Place a ``[B, T, H, W]`` host chunk on the mesh, batch-sharded."""
        if self.mesh is None:
            return jnp.asarray(chunk)
        return jax.device_put(chunk, batch_sharding(self.mesh, chunk.ndim))


def _unwrap(jitted):
    """The underlying python function of a jitted callable (re-jitted with
    shardings by the caller)."""
    return getattr(jitted, "__wrapped__", jitted)
