"""Measure per-transfer host-memory retention of the active JAX backend.

Discovered round 3 on the tunnel-attached TPU ('axon' platform, jax 0.9.0):
every host->device transfer permanently grows host RSS by ~the transferred
byte count plus ~2 KB — `jnp.asarray(np_buffer)` alone reproduces it, with
the SAME source buffer, after gc, and despite an explicit `.delete()` on the
device array. The true CPU backend is clean (0.0 MB over the same calls), so
this is a platform-client bug, not a framework one. The minimal repro is
written up upstream-ready in docs/axon_h2d_retention.md; consequences and
the framework-level mitigations are in docs/deployment.md ("Known platform
issue"); `track_resumable(isolate_slices=True)` bounds a long run's RSS by
running checkpoint slices in subprocesses.

The probe is importable (`probe(backend)`) so the test suite can gate the
library-side invariant: the CPU backend must stay clean — any regression
there would mean the framework itself (not the platform client) started
retaining per-transfer memory.

Usage:
    python tools/leak_probe.py          # active backend (TPU under axon)
    python tools/leak_probe.py cpu      # force the CPU backend

Prints one JSON line with KB retained per call for several buffer sizes.
"""

import gc
import json
import os
import sys


def rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e6


def probe(backend: str | None = None) -> dict:
    """Run the retention probe; ``backend`` forces a JAX platform (must be
    called before any other JAX use in the process to take effect)."""
    import numpy as np

    import jax

    if backend:
        jax.config.update("jax_platforms", backend)
    import jax.numpy as jnp

    out = {"backend": jax.default_backend(), "jax": jax.__version__, "trials": []}
    for shape, n in [((8, 105, 105), 150), ((8, 425, 425), 150), ((2, 2), 150)]:
        buf = np.random.default_rng(0).integers(0, 255, shape, np.uint8)
        y = jnp.asarray(buf)
        y.block_until_ready()
        del y  # warm: first transfer pays one-time client setup
        gc.collect()
        r0 = rss_mb()
        for _ in range(n):
            y = jnp.asarray(buf)
            y.block_until_ready()
            y.delete()
        gc.collect()
        grew = rss_mb() - r0
        out["trials"].append(
            {
                "shape": list(shape),
                "buffer_kb": round(buf.nbytes / 1024, 1),
                "calls": n,
                "retained_kb_per_call": round(grew * 1024 / n, 1),
            }
        )
    return out


def main():
    print(json.dumps(probe(sys.argv[1] if len(sys.argv) > 1 else None)))


if __name__ == "__main__":
    main()
