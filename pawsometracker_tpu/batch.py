"""Batched multi-video tracking — the framework's primary TPU scale-out API.

The reference processes videos strictly sequentially (reference:
src/PawsomeTracker.jl:203-207). On TPU the per-video scan is sequential but
*independent* across videos, so ``track_batch`` tracks B videos per device step
(``vmap`` over the batch axis) and shards the batch across chips via a device
mesh (``jax.sharding``; see :mod:`.parallel.mesh`). Host decode runs one
prefetch thread per video, assembling lockstep ``[B, T, H, W]`` chunks.
"""

from __future__ import annotations

import numpy as np

from .api import DEFAULT_CHUNK_SIZE, DEFAULT_MAX_DURATION_SECONDS, IJ, _resolve_guess
from .io.decode import ChunkPrefetcher, open_source
from .models.dog_tracker import make_spec
from .ops.dog_kernel import fix_window_size, guess_window_size
from .ops.filters import mode_u8_host
from .parallel.mesh import ShardedBatchTracker

__all__ = ["track_batch"]


def _broadcast(x, n, default):
    if x is None:
        return [default] * n
    if isinstance(x, (list, tuple)):
        if len(x) != n:
            raise ValueError(f"expected {n} entries, got {len(x)}")
        return [default if v is None else v for v in x]
    return [x] * n


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
    target_width: float = 25,
    start_location=None,
    window_size=None,
    darker_target: bool = True,
    fps: float = 24,
    sar: float | None = None,
    mesh=None,
    backend: str = "auto",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
):
    """Track one target in each of ``files`` concurrently on the device.

    Unlike ``track(list)`` (consecutive segments of ONE recording, reference:
    src/PawsomeTracker.jl:176-214), every file here is an independent video;
    all must share one resolution. ``start``/``stop``/``start_location`` may be
    scalars (broadcast) or per-file lists; ``start_location`` entries follow
    the same kinds as :func:`.api.track` (None / IJ / (x, y)).

    ``mesh``: a ``jax.sharding.Mesh`` to shard the batch across chips (None =
    single device). Returns a list of ``(ts, positions)`` per file.
    """
    import jax.numpy as jnp

    files = list(files)
    B = len(files)
    if B == 0:
        return []
    starts = [float(s) for s in _broadcast(start, B, 0.0)]
    stops = [float(s) for s in _broadcast(stop, B, DEFAULT_MAX_DURATION_SECONDS)]
    locs = (
        [start_location] * B if _is_single_location(start_location) else _broadcast(start_location, B, None)
    )
    if window_size is None:
        window_size = guess_window_size(target_width)
    window_size = fix_window_size(window_size)

    sources = []
    try:
        for f, t0, t1 in zip(files, starts, stops):
            sources.append(open_source(f, start=t0, stop=t1, fps=fps, backend=backend))

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
        engine = ShardedBatchTracker(spec, mesh)

        guesses = np.array(
            [
                _resolve_guess(loc, sar if sar is not None else s.info.sar, frame_shape)
                for loc, s in zip(locs, sources)
            ],
            np.int32,
        )
        auto = np.array([loc is None for loc in locs])

        f0 = engine.shard_chunk(frames0)
        fills_dev = jnp.asarray(fills)
        g_dev = jnp.asarray(guesses)
        pos_norm = engine.snap(f0, g_dev, fills_dev)
        if auto.any():
            pos_det = engine.snap_detect(f0, g_dev, fills_dev)
            pos = jnp.where(jnp.asarray(auto)[:, None], pos_det, pos_norm)
        else:
            pos = pos_norm

        positions = [[np.asarray(pos[b])] for b in range(B)]
        counts = [1] * B

        prefetcher_objs = [
            ChunkPrefetcher(s, chunk_size, max_frames=n - 1) for s, n in zip(sources, ns)
        ]
        prefetchers = [iter(p) for p in prefetcher_objs]
        active = [True] * B
        last_frames = [frames0[b] for b in range(B)]

        while any(active):
            batch = np.empty((B, chunk_size) + frame_shape, np.uint8)
            valid = np.zeros(B, np.int64)
            for b in range(B):
                if active[b]:
                    try:
                        chunk = next(prefetchers[b])
                    except StopIteration:
                        chunk = None
                    if chunk is None or chunk.shape[0] == 0:
                        active[b] = False
                    else:
                        k = chunk.shape[0]
                        valid[b] = k
                        batch[b, :k] = chunk
                        last_frames[b] = np.array(chunk[-1])
                        if k < chunk_size:
                            batch[b, k:] = chunk[-1]
                            active[b] = False
                        prefetcher_objs[b].recycle(chunk)
                if valid[b] == 0:
                    batch[b] = last_frames[b]
            if valid.sum() == 0:
                break
            pos_out = engine.scan(engine.shard_chunk(batch), pos, fills_dev)
            pos_host = np.asarray(pos_out)
            for b in range(B):
                k = int(valid[b])
                if k > 0:
                    positions[b].append(pos_host[b, :k])
                    counts[b] += k
            # carry each video's position at its own last VALID frame
            carry = np.stack(
                [
                    pos_host[b, int(valid[b]) - 1] if valid[b] > 0 else np.asarray(pos)[b]
                    for b in range(B)
                ]
            ).astype(np.int32)
            pos = engine.shard_chunk(carry)
    finally:
        for s in sources:
            s.close()

    out = []
    for b in range(B):
        ts = np.linspace(starts[b], stops[b], ns[b])[: counts[b]]
        ij = np.concatenate([p.reshape(-1, 2) for p in positions[b]], axis=0)[: counts[b]]
        out.append((ts, ij))
    return out
