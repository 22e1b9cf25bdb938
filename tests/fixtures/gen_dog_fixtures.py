"""Golden-fixture generator for the DoG matched-filter kernel.

Implements ImageFiltering.jl's documented ``Kernel.DoG`` definition
INDEPENDENTLY of the package (mpmath, 50-digit precision), so the committed
fixtures pin the package's kernel construction against the reference math
rather than against itself. Derivation: docs/dog_kernel_derivation.md;
reference use: /root/reference/src/PawsomeTracker.jl:30,42-43.

Definition being pinned (ImageFiltering.jl ``Kernel.DoG(sigma)``):

    sigma_center   = sigma
    sigma_surround = sqrt(2) * sigma
    L              = 4 * ceil(sigma_surround) + 1      (per dimension)
    g(s)[x]        = exp(-x^2 / (2 s^2)),  x in -L//2 .. L//2, unit-sum normalized
    DoG            = outer(g(sc), g(sc)) - outer(g(ss), g(ss))

and the tracker negates it for darker-than-background targets
(direction = -1, reference: src/PawsomeTracker.jl:42-43) so the maximum
response always marks the target.

Produces, for target_width in {6, 10, 25} (sigma = tw / (2 sqrt(2 ln 2))):

- ``dog_tw{tw}_f64.npy``   — float64 kernel, each entry the nearest float64
                             to the exact real value (darker_target=True sign)
- ``meta_tw{tw}.json``     — sigma, support length L

Run from the repo root:  python tests/fixtures/gen_dog_fixtures.py
"""

import json
import os

import mpmath as mp
import numpy as np

mp.mp.dps = 50

HERE = os.path.dirname(os.path.abspath(__file__))


def gaussian_exact(sigma: mp.mpf, length: int):
    """Unit-sum truncated Gaussian, exact arithmetic."""
    half = length // 2
    vals = [mp.e ** (-(mp.mpf(x) ** 2) / (2 * sigma**2)) for x in range(-half, half + 1)]
    s = mp.fsum(vals)
    return [v / s for v in vals]


def dog_exact(target_width: int):
    # FWHM -> sigma (reference: src/PawsomeTracker.jl:30)
    sigma = mp.mpf(target_width) / (2 * mp.sqrt(2 * mp.log(2)))
    sigma_s = sigma * mp.sqrt(2)
    length = 4 * int(mp.ceil(sigma_s)) + 1
    gc = gaussian_exact(sigma, length)
    gs = gaussian_exact(sigma_s, length)
    k = np.empty((length, length), np.float64)
    for i in range(length):
        for j in range(length):
            # darker_target=True sign: direction = -1
            k[i, j] = float(-(gc[i] * gc[j] - gs[i] * gs[j]))
    return k, float(sigma), length


def main():
    for tw in (6, 10, 25):
        k, sigma, length = dog_exact(tw)
        np.save(os.path.join(HERE, f"dog_tw{tw}_f64.npy"), k)
        with open(os.path.join(HERE, f"meta_tw{tw}.json"), "w") as f:
            json.dump({"target_width": tw, "sigma": sigma, "length": length}, f)
        print(f"tw={tw}: sigma={sigma:.12f} L={length} sum={k.sum():.3e}")


if __name__ == "__main__":
    main()
