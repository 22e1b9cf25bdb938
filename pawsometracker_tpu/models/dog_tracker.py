"""The DoG tracker model — the framework's flagship compute path.

TPU-native redesign of the reference's per-frame hot loop
(reference: src/PawsomeTracker.jl:32-62):

- The tracker state is a static, hashable :class:`TrackerSpec`; all per-spec
  functions are jitted once and cached (XLA traces with static shapes).
- One frame step = pad-with-mode -> ``lax.dynamic_slice`` the guess-centered
  search window (+ kernel apron) -> DoG response via two separable Gaussian
  correlations -> column-major argmax -> map window index back to absolute
  frame coordinates -> clamp to the frame.
- A video is tracked by ``jax.lax.scan`` over a ``[T, H, W]`` uint8 frame chunk
  carrying the position (the recurrence is inherently sequential: each window
  depends on the previous result). Throughput scale-out comes from ``vmap``
  over a batch of videos, sharded over a device mesh (see ``parallel/``).

All coordinates are 0-based ``(row, col)`` int32. The reference's 1-based Julia
conventions map as ``julia_index = py_index + 1``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

import math

from ..ops.dog_kernel import (
    default_gaussian_len,
    dog_kernel_2d,
    dog_kernel_separable,
    get_sigma,
)
from ..ops.filters import argmax_colmajor, separable_correlate_valid

__all__ = ["TrackerSpec", "TrackerFns", "tracker_fns", "center_guess", "autodetect_spec"]


@dataclass(frozen=True)
class TrackerSpec:
    """Static configuration of one tracker instance.

    Mirrors the reference ``Tracker`` constructor inputs
    (reference: src/PawsomeTracker.jl:39-52) minus the live buffers, which in
    JAX are functional arguments instead of mutable state.
    """

    frame_shape: tuple[int, int]  # (H, W)
    window_size: tuple[int, int]  # (rows, cols) — already normalized
    target_width: float
    darker_target: bool

    @property
    def sigma(self) -> float:
        return get_sigma(self.target_width)

    @property
    def radii(self) -> tuple[int, int]:
        # reference: src/PawsomeTracker.jl:44
        return (self.window_size[0] // 2, self.window_size[1] // 2)

    @property
    def kernel_len(self) -> int:
        # support comes from the SURROUND gaussian (sigma * sqrt(2)); integer
        # math only — building the 2-D kernel just to read its length paid
        # two LxL outer products per access
        return default_gaussian_len(self.sigma * math.sqrt(2.0))

    @property
    def pad(self) -> tuple[int, int]:
        """Apron each frame needs so every window tap is in-bounds.

        The reference pads by ``radii + kernel_size`` (src/PawsomeTracker.jl:45)
        which is more than needed; ``radii + L//2`` is exactly sufficient and
        produces identical responses (same constant fill value).
        """
        half = self.kernel_len // 2
        return (self.radii[0] + half, self.radii[1] + half)

    @property
    def patch_shape(self) -> tuple[int, int]:
        ri, rj = self.radii
        L = self.kernel_len
        return (2 * ri + L, 2 * rj + L)


def center_guess(frame_shape: tuple[int, int]) -> tuple[int, int]:
    """Frame-center starting guess, 0-based.

    The reference uses the 1-based ``sz .div 2`` (src/PawsomeTracker.jl:86-90);
    in 0-based coordinates that is ``sz//2 - 1``.
    """
    return (frame_shape[0] // 2 - 1, frame_shape[1] // 2 - 1)


def autodetect_spec(spec: TrackerSpec) -> TrackerSpec:
    """First-pass auto-detection spec with a quarter-frame window
    (reference: src/PawsomeTracker.jl:99-107)."""
    h, w = spec.frame_shape
    return TrackerSpec(
        frame_shape=spec.frame_shape,
        window_size=(h // 4, w // 4),
        target_width=spec.target_width,
        darker_target=spec.darker_target,
    )


@dataclass(frozen=True)
class TrackerFns:
    """Jitted, spec-specialized tracker entry points.

    - ``snap(frame_u8 [H,W], guess int32[2], fill_u8) -> int32[2]``
    - ``scan(frames_u8 [T,H,W], pos0 int32[2], fill_u8) -> positions int32[T,2]``
    - ``snap_batch`` / ``scan_batch``: same with a leading batch axis
      (frames ``[B,...]``, pos ``[B,2]``, fill ``[B]``).
    """

    spec: TrackerSpec
    snap: callable
    scan: callable
    snap_batch: callable
    scan_batch: callable
    scan_bounded: callable
    scan_sub: callable
    snap_sub: callable
    scan_multi: callable
    snap_multi: callable
    scan_multi_sub: callable
    snap_multi_sub: callable
    step_padded: callable
    pad_frame: callable


def _build(spec: TrackerSpec) -> TrackerFns:
    gc_np, gs_np, direction, L = dog_kernel_separable(spec.sigma, spec.darker_target)
    gc = jnp.asarray(gc_np, jnp.float32)
    gs = jnp.asarray(gs_np, jnp.float32)
    ri, rj = spec.radii
    H, W = spec.frame_shape
    pi, pj = spec.pad
    ph, pw = spec.patch_shape
    radii_arr = np.array([ri, rj], np.int32)
    max_pos = np.array([H - 1, W - 1], np.int32)

    def pad_frame(frame_u8, fill_u8):
        return jnp.pad(frame_u8, ((pi, pi), (pj, pj)), constant_values=fill_u8)

    def step_padded(padded_u8, pos):
        """One tracker step on an already-padded frame.

        With pad = radii + L//2, the patch origin in padded coordinates is
        exactly ``pos`` (reference hot loop: src/PawsomeTracker.jl:55-62).
        """
        patch = jax.lax.dynamic_slice(padded_u8, (pos[0], pos[1]), (ph, pw)).astype(jnp.float32)
        # DoG response as a difference of two separable Gaussian correlations.
        # The /255 uint8 normalization is omitted: the kernel sums to ~0, so
        # the response is affine-intensity-invariant and the argmax unchanged.
        resp = direction * (
            separable_correlate_valid(patch, gc, gc) - separable_correlate_valid(patch, gs, gs)
        )
        idx = argmax_colmajor(resp)
        new = pos - radii_arr + idx
        return jnp.clip(new, 0, max_pos).astype(jnp.int32)

    wh, ww = 2 * ri + 1, 2 * rj + 1

    def _response(padded_u8, pos):
        patch = jax.lax.dynamic_slice(padded_u8, (pos[0], pos[1]), (ph, pw)).astype(jnp.float32)
        return direction * (
            separable_correlate_valid(patch, gc, gc) - separable_correlate_valid(patch, gs, gs)
        )

    def _step_bounded(padded_u8, pos, lo, hi):
        """Step with dynamic clamp bounds — used by the ROI streaming path,
        where the scan runs in crop coordinates and the clamp must be to the
        FRAME bounds mapped into the crop (not the crop edges)."""
        resp = _response(padded_u8, pos)
        idx = argmax_colmajor(resp)
        new = pos - radii_arr + idx
        return jnp.clip(new, lo, hi).astype(jnp.int32)

    def _parabolic_offset(resp, idx):
        """Per-axis quadratic peak interpolation in [-0.5, 0.5]; 0 at window
        edges or where the response is not locally concave. Sub-pixel output
        refinement only — the integer recurrence is unchanged."""
        i0, j0 = idx[0], idx[1]

        def axis_off(i, n, minus, plus):
            c = resp[i0, j0]
            denom = minus - 2.0 * c + plus
            interior = (i > 0) & (i < n - 1) & (denom < 0)
            return jnp.where(interior, 0.5 * (minus - plus) / jnp.where(denom < 0, denom, -1.0), 0.0)

        rm = resp[jnp.clip(i0 - 1, 0, wh - 1), j0]
        rp = resp[jnp.clip(i0 + 1, 0, wh - 1), j0]
        cm = resp[i0, jnp.clip(j0 - 1, 0, ww - 1)]
        cp = resp[i0, jnp.clip(j0 + 1, 0, ww - 1)]
        return jnp.stack([axis_off(i0, wh, rm, rp), axis_off(j0, ww, cm, cp)])

    def _step_sub(padded_u8, pos, lo, hi):
        resp = _response(padded_u8, pos)
        idx = argmax_colmajor(resp)
        off = _parabolic_offset(resp, idx)
        new = jnp.clip(pos - radii_arr + idx, lo, hi).astype(jnp.int32)
        return new, off.astype(jnp.float32)

    def snap(frame_u8, guess, fill_u8):
        return step_padded(pad_frame(frame_u8, fill_u8), guess.astype(jnp.int32))

    def scan(frames_u8, pos0, fill_u8):
        def body(pos, frame):
            new = step_padded(pad_frame(frame, fill_u8), pos)
            return new, new

        _, positions = jax.lax.scan(body, pos0.astype(jnp.int32), frames_u8)
        return positions

    def scan_bounded(frames_u8, pos0, fill_u8, deltas, lo, hi):
        """Bounded scan in PER-FRAME crop coordinates (the ROI streaming
        path): frame ``i`` was cropped at its own origin, so the carried
        position is rebased by ``deltas[i] = origin[i-1] - origin[i]``
        before the step (``deltas[0]`` rebases ``pos0`` — 0 for a chain
        start, the chunk-to-chunk origin shift for a chained scan), and the
        frame-bound clamp box ``lo[i]``/``hi[i]`` is per frame too.
        ``deltas``/``lo``/``hi`` are int32 ``[T, 2]``."""

        def body(pos, xs):
            frame, d, l, h = xs
            new = _step_bounded(pad_frame(frame, fill_u8), pos + d, l, h)
            return new, new

        _, positions = jax.lax.scan(
            body,
            pos0.astype(jnp.int32),
            (frames_u8, deltas.astype(jnp.int32), lo.astype(jnp.int32), hi.astype(jnp.int32)),
        )
        return positions

    def scan_sub(frames_u8, pos0, fill_u8, deltas, lo, hi):
        """:func:`scan_bounded` that also returns per-frame sub-pixel offsets."""

        def body(pos, xs):
            frame, d, l, h = xs
            new, off = _step_sub(pad_frame(frame, fill_u8), pos + d, l, h)
            return new, (new, off)

        _, (positions, offs) = jax.lax.scan(
            body,
            pos0.astype(jnp.int32),
            (frames_u8, deltas.astype(jnp.int32), lo.astype(jnp.int32), hi.astype(jnp.int32)),
        )
        return positions, offs

    def snap_sub(frame_u8, guess, fill_u8):
        lo = jnp.zeros((2,), jnp.int32)
        hi = jnp.asarray(max_pos)
        return _step_sub(pad_frame(frame_u8, fill_u8), guess.astype(jnp.int32), lo, hi)

    def scan_multi(frames_u8, pos0s, fill_u8):
        """Track N independent targets through ONE frame stream: the frame is
        padded once per step and the window step is vmapped over targets.
        ``pos0s int32 [N, 2] -> positions int32 [T, N, 2]``. (Extension beyond
        the reference, which tracks a single target.)"""

        def body(poss, frame):
            padded = pad_frame(frame, fill_u8)
            new = jax.vmap(lambda p: step_padded(padded, p))(poss)
            return new, new

        _, positions = jax.lax.scan(body, pos0s.astype(jnp.int32), frames_u8)
        return positions

    def snap_multi(frame_u8, guesses, fill_u8):
        padded = pad_frame(frame_u8, fill_u8)
        return jax.vmap(lambda p: step_padded(padded, p.astype(jnp.int32)))(guesses)

    def scan_multi_sub(frames_u8, pos0s, fill_u8):
        """:func:`scan_multi` + per-frame-per-target sub-pixel offsets
        (``-> (int32 [T, N, 2], float32 [T, N, 2])``)."""
        lo = jnp.zeros((2,), jnp.int32)
        hi = jnp.asarray(max_pos)

        def body(poss, frame):
            padded = pad_frame(frame, fill_u8)
            new, offs = jax.vmap(lambda p: _step_sub(padded, p, lo, hi))(poss)
            return new, (new, offs)

        _, (positions, offs) = jax.lax.scan(body, pos0s.astype(jnp.int32), frames_u8)
        return positions, offs

    def snap_multi_sub(frame_u8, guesses, fill_u8):
        padded = pad_frame(frame_u8, fill_u8)
        lo = jnp.zeros((2,), jnp.int32)
        hi = jnp.asarray(max_pos)
        return jax.vmap(lambda p: _step_sub(padded, p.astype(jnp.int32), lo, hi))(guesses)

    snap_j = jax.jit(snap)
    scan_j = jax.jit(scan)
    snap_b = jax.jit(jax.vmap(snap))
    scan_b = jax.jit(jax.vmap(scan))
    return TrackerFns(
        spec=spec,
        snap=snap_j,
        scan=scan_j,
        snap_batch=snap_b,
        scan_batch=scan_b,
        scan_bounded=jax.jit(scan_bounded),
        scan_sub=jax.jit(scan_sub),
        snap_sub=jax.jit(snap_sub),
        scan_multi=jax.jit(scan_multi),
        snap_multi=jax.jit(snap_multi),
        scan_multi_sub=jax.jit(scan_multi_sub),
        snap_multi_sub=jax.jit(snap_multi_sub),
        step_padded=step_padded,
        pad_frame=pad_frame,
    )


@functools.lru_cache(maxsize=256)
def tracker_fns(spec: TrackerSpec) -> TrackerFns:
    """Jitted tracker functions for ``spec`` (cached per spec)."""
    return _build(spec)


def make_spec(frame_shape, window_size, target_width, darker_target) -> TrackerSpec:
    """Build a spec.

    ``window_size`` is a scalar edge length or an ALREADY-NORMALIZED
    ``(rows, cols)`` pair. The single point of the reference's ``(w, h)`` ->
    ``(h, w)`` reversal is :func:`fix_window_size`, applied exactly once at
    the public API boundary (reference: src/PawsomeTracker.jl:70-72,44);
    ``make_spec`` must NOT reverse again, or rectangular windows transpose.
    """
    if isinstance(window_size, (tuple, list)):
        if len(window_size) != 2:
            raise ValueError(f"window_size must be an int or (rows, cols), got {window_size!r}")
        ws = (int(window_size[0]), int(window_size[1]))
    else:
        ws = (int(window_size), int(window_size))
    if not float(target_width) > 0:
        # sigma=0 would yield an identically-zero DoG kernel: the tracker
        # would silently march every track to the frame corner
        raise ValueError(f"target_width must be > 0, got {target_width!r}")
    if ws[0] < 1 or ws[1] < 1:
        raise ValueError(f"window_size must be >= 1 per axis, got {ws!r}")
    return TrackerSpec(
        frame_shape=(int(frame_shape[0]), int(frame_shape[1])),
        window_size=ws,
        target_width=float(target_width),
        darker_target=bool(darker_target),
    )
