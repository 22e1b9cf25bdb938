"""Difference-of-Gaussians (DoG) matched-filter construction.

Static (trace-time) kernel math, computed with numpy on the host and baked into
the jitted tracker as constants. Semantics mirror the reference tracker's
kernel construction (reference: src/PawsomeTracker.jl:30,39-52 and
ImageFiltering.jl's ``Kernel.DoG``):

- ``target_width`` is the *full width* (diameter) of the target, interpreted as
  the FWHM of the center Gaussian: ``sigma = target_width / (2*sqrt(2*ln 2))``
  (reference: src/PawsomeTracker.jl:30).
- ``DoG(sigma)`` = ``G(sigma) - G(sqrt(2)*sigma)`` where each 2-D Gaussian is a
  separable outer product of truncated, *unit-sum-normalized* 1-D Gaussians and
  the square support is taken from the surround (larger) Gaussian's default
  window ``4*ceil(sqrt(2)*sigma) + 1`` per dimension. The resulting kernel sums
  to ~0, which makes the filter response invariant to affine intensity shifts.
- The kernel is negated for darker-than-background targets so that the maximum
  filter response always marks the target (reference: src/PawsomeTracker.jl:42-43).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "FWHM_TO_SIGMA",
    "get_sigma",
    "gaussian_1d",
    "default_gaussian_len",
    "dog_kernel_2d",
    "dog_kernel_separable",
    "guess_window_size",
    "fix_window_size",
]

#: FWHM = FWHM_TO_SIGMA * sigma for a Gaussian.
FWHM_TO_SIGMA = 2.0 * math.sqrt(2.0 * math.log(2.0))


def get_sigma(target_width: float) -> float:
    """FWHM -> sigma conversion (reference: src/PawsomeTracker.jl:30)."""
    return target_width / FWHM_TO_SIGMA


def default_gaussian_len(sigma: float) -> int:
    """Default truncated-Gaussian support length: ``4*ceil(sigma) + 1`` (odd)."""
    return 4 * math.ceil(sigma) + 1


def gaussian_1d(sigma: float, length: int) -> np.ndarray:
    """Truncated 1-D Gaussian of odd support ``length``, normalized to unit sum."""
    if length % 2 != 1:
        raise ValueError(f"gaussian support must be odd, got {length}")
    half = length // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    if sigma > 0:
        g = np.exp(-(x**2) / (2.0 * sigma**2))
    else:
        g = (x == 0).astype(np.float64)
    return g / g.sum()


def dog_kernel_separable(sigma: float, darker_target: bool):
    """1-D factors of the signed DoG: ``(g_center, g_surround, direction, L)``.

    The 2-D DoG is ``direction * (outer(gc, gc) - outer(gs, gs))`` — not itself
    separable, but expressible as a difference of two separable (rank-1)
    filters, which is how the fast paths evaluate it.
    """
    sigma_surround = sigma * math.sqrt(2.0)
    length = default_gaussian_len(sigma_surround)
    gc = gaussian_1d(sigma, length)
    gs = gaussian_1d(sigma_surround, length)
    direction = -1.0 if darker_target else 1.0
    return gc, gs, direction, length


def dog_kernel_2d(sigma: float, darker_target: bool) -> tuple[np.ndarray, int]:
    """Signed 2-D DoG kernel ``(kernel[L, L] float32, L)``.

    ``kernel = direction * (G(sigma) - G(sqrt2*sigma))`` with support
    ``L = 4*ceil(sqrt2*sigma)+1`` per dim (reference: src/PawsomeTracker.jl:43
    via ImageFiltering's ``Kernel.DoG``; sign at :42).
    """
    gc, gs, direction, length = dog_kernel_separable(sigma, darker_target)
    dog = np.outer(gc, gc) - np.outer(gs, gs)
    return (direction * dog).astype(np.float32), length


def guess_window_size(target_width: float) -> int:
    """Default square search-window edge: ``4*ceil(sigma)+1`` using the *center*
    sigma (reference: src/PawsomeTracker.jl:64-68 — note this deliberately uses
    the center Gaussian's default support, not the surround's)."""
    return default_gaussian_len(get_sigma(target_width))


def fix_window_size(window_size) -> tuple[int, int]:
    """Normalize a window size to ``(rows, cols)``.

    A ``(w, h)`` pair is reversed to ``(h, w)`` = (rows, cols); a scalar ``l``
    becomes ``(l, l)`` (reference: src/PawsomeTracker.jl:70-72).
    """
    if isinstance(window_size, (tuple, list)):
        if len(window_size) != 2:
            raise ValueError(f"window_size must be an int or (w, h), got {window_size!r}")
        w, h = window_size
        return (int(h), int(w))
    return (int(window_size), int(window_size))
