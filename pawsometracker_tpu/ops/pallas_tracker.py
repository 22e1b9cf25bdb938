"""Fused Pallas TPU kernel: the entire per-video tracking scan in one launch.

The reference's hot loop runs a multithreaded CPU FIR filter once per frame
(reference: src/PawsomeTracker.jl:55-62). The TPU-native design eliminates the
per-frame launch/transfer overhead entirely:

- ONE ``pallas_call`` with ``grid=(T,)`` (TPU grid steps execute sequentially)
  tracks a whole frame chunk; the carried position lives in SMEM scratch and
  survives across grid steps.
- Frames stay in **HBM**; each step DMAs only the guess-centered search window
  (+ kernel apron) into VMEM — a few KB instead of the whole frame.
- The DoG response is computed as two banded-matmul pairs on the **MXU**
  (separable Gaussians: ``resp = G1r·P·G1cᵀ − G2r·P·G2cᵀ``, with the
  darker-target sign baked into G1r/G2r).
- The column-major first-max (Julia ``findmax`` tie-break,
  reference: src/PawsomeTracker.jl:59) is a masked min-reduction over a
  column-major linear index map — no 1-D iota, VPU-friendly.

The kernel consumes frames pre-padded with the mode fill value (one fused XLA
pad per chunk), so window DMA origins are always in-bounds: with
``pad = radii + L//2`` the patch origin in padded coordinates equals the
(clamped) position itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dog_kernel import dog_kernel_separable

__all__ = ["banded_correlation_matrix", "pallas_scan_fn", "pallas_available"]


def pallas_available() -> bool:
    """True when running on a TPU backend (the kernel also runs anywhere in
    interpret mode, used by the CPU test suite)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def banded_correlation_matrix(g: np.ndarray, out_len: int) -> np.ndarray:
    """``B [out_len, out_len+L-1]`` with ``B[a, a+k] = g[k]`` so that ``B @ P``
    computes the valid 1-D correlation of each column of ``P`` with ``g``."""
    L = g.shape[0]
    B = np.zeros((out_len, out_len + L - 1), np.float32)
    for a in range(out_len):
        B[a, a : a + L] = g
    return B


@functools.lru_cache(maxsize=128)
def _scan_fn_cached(
    frame_shape: tuple[int, int],
    radii: tuple[int, int],
    sigma: float,
    darker_target: bool,
    batched: bool,
    interpret: bool,
    bounded: bool = False,
    subpixel: bool = False,
):
    gc, gs, direction, L = dog_kernel_separable(sigma, darker_target)
    ri, rj = radii
    H, W = frame_shape
    wh, ww = 2 * ri + 1, 2 * rj + 1  # window (= response) dims
    ph, pw = wh + L - 1, ww + L - 1  # patch dims (window + kernel apron)
    pi, pj = ri + L // 2, rj + L // 2  # frame padding

    # HBM DMA slices must be (8, 128)-tile aligned: each step copies an aligned
    # superset region and rotates by the residual (sub-tile) offset in VMEM.
    def _ceil(x, m):
        return -(-x // m) * m

    R8 = _ceil(ph + 7, 8)  # aligned rows: covers any di in [0, 8)
    C128 = _ceil(pw + 127, 128)  # aligned lanes: covers any dj in [0, 128)
    i8_max = 8 * ((H - 1) // 8)
    j128_max = 128 * ((W - 1) // 128)
    Hp = max(H + 2 * pi, i8_max + R8)  # padded frame dims (fill-valued apron)
    Wp = max(W + 2 * pj, j128_max + C128)

    # banded separable-correlation operators, DoG sign baked into the row ops
    g1r = jnp.asarray(direction * banded_correlation_matrix(gc, wh))
    g2r = jnp.asarray(direction * banded_correlation_matrix(gs, wh))
    g1c = jnp.asarray(banded_correlation_matrix(gc, ww))
    g2c = jnp.asarray(banded_correlation_matrix(gs, ww))

    LANES = 128  # TPU lane width; positions ride lanes 0/1 of one output row

    def kernel(pos0_ref, frames_ref, g1r_ref, g1c_ref, g2r_ref, g2c_ref,
               out_ref, *rest):
        if subpixel:
            off_ref, patch_ref, sem, pos_s = rest
        else:
            patch_ref, sem, pos_s = rest
        if batched:
            b = pl.program_id(0)
            t = pl.program_id(1)
        else:
            b = None
            t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            pos_s[0] = pos0_ref[0] if not batched else pos0_ref[b, 0]
            pos_s[1] = pos0_ref[1] if not batched else pos0_ref[b, 1]

        if bounded:
            # per-step rebase deltas + dynamic clamp bounds ride the
            # scalar-prefetch array (layout per batch row:
            # [i, j, d(0,0), d(0,1), ..., d(T-1,1), lo..., hi...] — the ROI
            # streaming path crops each frame at its own predicted origin,
            # so the carried position is rebased by
            # ``delta[t] = origin[t-1] - origin[t]`` before step ``t`` and
            # the frame-bound clamp box is per frame)
            T_steps = pl.num_programs(1 if batched else 0)
            base = 2
            if batched:
                d0 = pos0_ref[b, base + 2 * t]
                d1 = pos0_ref[b, base + 2 * t + 1]
                lo0 = pos0_ref[b, base + 2 * T_steps + 2 * t]
                lo1 = pos0_ref[b, base + 2 * T_steps + 2 * t + 1]
                hi0 = pos0_ref[b, base + 4 * T_steps + 2 * t]
                hi1 = pos0_ref[b, base + 4 * T_steps + 2 * t + 1]
            else:
                d0 = pos0_ref[base + 2 * t]
                d1 = pos0_ref[base + 2 * t + 1]
                lo0 = pos0_ref[base + 2 * T_steps + 2 * t]
                lo1 = pos0_ref[base + 2 * T_steps + 2 * t + 1]
                hi0 = pos0_ref[base + 4 * T_steps + 2 * t]
                hi1 = pos0_ref[base + 4 * T_steps + 2 * t + 1]
        else:
            d0 = d1 = 0
            lo0 = lo1 = 0
            hi0, hi1 = H - 1, W - 1

        # Entry clamp: a CHAINED start position can land outside the crop on
        # a speculative mispredict (origin delta applied to the previous
        # chunk's position) — detected and replayed only AFTER this scan
        # runs. The DMA origin math below is defined for i in [0, H-1];
        # without the clamp i8 can go negative or past the padded extent:
        # an out-of-bounds HBM DMA (undefined on hardware; interpret mode
        # clamps silently, so CI can't see it). The XLA engine's
        # dynamic_slice clamps the same way. Mispredict results are garbage
        # either way and are discarded by the replay — the clamp just makes
        # them DEFINED garbage. Contained runs have i/j in range already,
        # so this is an identity for every kept result.
        i = jnp.clip(pos_s[0] + d0, 0, H - 1)
        j = jnp.clip(pos_s[1] + d1, 0, W - 1)
        # window DMA: padded origin == position (pad = radii + L//2), rounded
        # down to the (8, 128) tile grid; residual handled by VMEM rotation
        i8 = (i // 8) * 8
        j128 = (j // 128) * 128
        if batched:
            src = frames_ref.at[b, t, pl.ds(i8, R8), pl.ds(j128, C128)]
        else:
            src = frames_ref.at[t, pl.ds(i8, R8), pl.ds(j128, C128)]
        dma = pltpu.make_async_copy(src, patch_ref, sem)
        dma.start()
        dma.wait()

        # Mosaic has no direct u8->f32 cast; hop through int32
        big = patch_ref[:].astype(jnp.int32).astype(jnp.float32)
        # extract the residual-offset patch with dynamic selection matmuls
        # (dynamic sublane rotates miscompile; MXU selection is exact):
        # Sr[a, b] = (b == a + di), Sc[c, b] = (b == c + dj)
        di = i - i8
        dj = j - j128
        sr = (
            jax.lax.broadcasted_iota(jnp.int32, (ph, R8), 1)
            == jax.lax.broadcasted_iota(jnp.int32, (ph, R8), 0) + di
        ).astype(jnp.float32)
        sc = (
            jax.lax.broadcasted_iota(jnp.int32, (pw, C128), 1)
            == jax.lax.broadcasted_iota(jnp.int32, (pw, C128), 0) + dj
        ).astype(jnp.float32)
        patch = jnp.dot(
            jnp.dot(sr, big, preferred_element_type=jnp.float32),
            sc.T,
            preferred_element_type=jnp.float32,
        )
        # DoG response on the MXU: two banded-matmul pairs. precision=HIGHEST
        # so interpret mode lowers to the SAME XLA dots as the XLA engine's
        # separable_correlate_valid — bit-identical responses, hence identical
        # argmax tie-breaks (on TPU hardware f32 matmuls are exact either way)
        r1 = jnp.dot(
            jnp.dot(g1r_ref[:], patch, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST),
            g1c_ref[:].T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        r2 = jnp.dot(
            jnp.dot(g2r_ref[:], patch, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST),
            g2c_ref[:].T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        resp = r1 - r2

        # column-major first max: min-reduce the column-major linear index
        # (col*wh + row) over the argmax set — Julia findmax tie-break
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 1)
        colmajor_idx = col_ids * wh + row_ids
        m = jnp.max(resp)
        k = jnp.min(jnp.where(resp == m, colmajor_idx, wh * ww))
        row = k % wh
        col = k // wh
        ni = jnp.clip(i - ri + row, lo0, hi0)
        nj = jnp.clip(j - rj + col, lo1, hi1)
        pos_s[0] = ni
        pos_s[1] = nj
        # one lane-padded row per step: lanes 0/1 carry (row, col)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        out_row = jnp.where(lane == 0, ni, jnp.where(lane == 1, nj, 0))
        if batched:
            out_ref[0, pl.ds(t, 1), :] = out_row
        else:
            out_ref[pl.ds(t, 1), :] = out_row

        if subpixel:
            # per-axis parabolic peak offsets in [-0.5, 0.5], matching the XLA
            # _parabolic_offset (models/dog_tracker.py) semantics: 0 at window
            # edges or non-concave neighborhoods; the 4 neighbors are read by
            # masked reductions (no dynamic VMEM gathers in Mosaic). resp[idx]
            # == m exactly, so the center value is the reduced max.
            at_col = col_ids == col
            at_row = row_ids == row
            rm = jnp.sum(jnp.where((row_ids == row - 1) & at_col, resp, 0.0))
            rp = jnp.sum(jnp.where((row_ids == row + 1) & at_col, resp, 0.0))
            cm = jnp.sum(jnp.where(at_row & (col_ids == col - 1), resp, 0.0))
            cp = jnp.sum(jnp.where(at_row & (col_ids == col + 1), resp, 0.0))
            den_r = rm - 2.0 * m + rp
            den_c = cm - 2.0 * m + cp
            int_r = (row > 0) & (row < wh - 1) & (den_r < 0)
            int_c = (col > 0) & (col < ww - 1) & (den_c < 0)
            off_i = jnp.where(
                int_r, 0.5 * (rm - rp) / jnp.where(den_r < 0, den_r, -1.0), 0.0
            )
            off_j = jnp.where(
                int_c, 0.5 * (cm - cp) / jnp.where(den_c < 0, den_c, -1.0), 0.0
            )
            off_row = jnp.where(
                lane == 0, off_i, jnp.where(lane == 1, off_j, 0.0)
            ).astype(jnp.float32)
            if batched:
                off_ref[0, pl.ds(t, 1), :] = off_row
            else:
                off_ref[pl.ds(t, 1), :] = off_row

    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def run(frames_u8, pos0, fill_u8, deltas=None, lo=None, hi=None):
        """frames_u8 ``[T, H, W]`` (or ``[B, T, H, W]``), pos0 int32 ``[2]``
        (or ``[B, 2]``) -> positions int32 ``[T, 2]`` (or ``[B, T, 2]``).
        In bounded mode ``deltas``/``lo``/``hi`` are per-frame ``[T, 2]``
        (``[B, T, 2]`` batched): the carried position's rebase between
        consecutive per-frame crop origins, and the dynamic clamp box (frame
        bounds mapped into each frame's crop coordinates) — see the ROI
        streaming path."""
        if bounded:
            lead = pos0.shape[:-1]  # () or (B,)
            flat = lambda a: a.astype(jnp.int32).reshape(lead + (-1,))
            pos0 = jnp.concatenate(
                [pos0.astype(jnp.int32), flat(deltas), flat(lo), flat(hi)],
                axis=-1,
            )
        if batched:
            B, T = frames_u8.shape[0], frames_u8.shape[1]
            fills = jnp.asarray(fill_u8)
            if fills.ndim == 0:
                padded = jnp.pad(
                    frames_u8,
                    ((0, 0), (0, 0), (pi, Hp - H - pi), (pj, Wp - W - pj)),
                    constant_values=fill_u8,
                )
            else:
                # per-video mode fill (each video pads with ITS first frame's mode)
                padded = jax.vmap(
                    lambda f, fl: jnp.pad(
                        f, ((0, 0), (pi, Hp - H - pi), (pj, Wp - W - pj)), constant_values=fl
                    )
                )(frames_u8, fills)
            grid = (B, T)
            out_shape = jax.ShapeDtypeStruct((B, T, LANES), jnp.int32)
            # index maps receive the scalar-prefetch ref as a trailing arg;
            # the (1, T, LANES) block stays resident across the t steps of one b
            out_spec = pl.BlockSpec(
                (1, T, LANES), lambda b, t, *_: (b, 0, 0), memory_space=pltpu.VMEM
            )
            off_shape = jax.ShapeDtypeStruct((B, T, LANES), jnp.float32)
            off_spec = pl.BlockSpec(
                (1, T, LANES), lambda b, t, *_: (b, 0, 0), memory_space=pltpu.VMEM
            )
            frame_spec = pl.BlockSpec(memory_space=pl.ANY)
        else:
            T = frames_u8.shape[0]
            padded = jnp.pad(
                frames_u8, ((0, 0), (pi, Hp - H - pi), (pj, Wp - W - pj)), constant_values=fill_u8
            )
            grid = (T,)
            out_shape = jax.ShapeDtypeStruct((T, LANES), jnp.int32)
            out_spec = pl.BlockSpec((T, LANES), lambda t, *_: (0, 0), memory_space=pltpu.VMEM)
            off_shape = jax.ShapeDtypeStruct((T, LANES), jnp.float32)
            off_spec = pl.BlockSpec((T, LANES), lambda t, *_: (0, 0), memory_space=pltpu.VMEM)
            frame_spec = pl.BlockSpec(memory_space=pl.ANY)
        if subpixel:
            out_shape = (out_shape, off_shape)
            out_spec = (out_spec, off_spec)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                frame_spec,
                mat_spec,
                mat_spec,
                mat_spec,
                mat_spec,
            ],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((R8, C128), jnp.uint8),
                pltpu.SemaphoreType.DMA,
                pltpu.SMEM((2,), jnp.int32),
            ],
        )
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * len(grid),
            )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
            **kwargs,
        )(pos0.astype(jnp.int32), padded, g1r, g1c, g2r, g2c)
        if subpixel:
            return out[0][..., :2], out[1][..., :2]
        return out[..., :2]

    return jax.jit(run)


def pallas_scan_fn(spec, *, batched: bool = False, interpret: bool = False,
                   bounded: bool = False, subpixel: bool = False):
    """Jitted fused-scan entry for a :class:`~..models.dog_tracker.TrackerSpec`.

    Signature matches ``TrackerFns.scan`` / ``scan_batch`` (or
    ``scan_bounded`` with ``bounded=True``, taking trailing per-frame
    ``deltas, lo, hi``):
    ``fn(frames_u8, pos0, fill_u8[, deltas, lo, hi]) -> positions``. With
    ``subpixel=True`` (requires ``bounded=True``) the kernel additionally
    emits per-step parabolic peak offsets — the fused analog of
    ``TrackerFns.scan_sub`` — returning ``(positions, offsets)``.
    """
    if subpixel and not bounded:
        raise ValueError("subpixel pallas scan requires bounded=True (the ROI pipeline form)")
    return _scan_fn_cached(
        spec.frame_shape,
        spec.radii,
        spec.sigma,
        spec.darker_target,
        batched,
        interpret,
        bounded,
        subpixel,
    )
