"""Gated memory-retention regression (round-4 VERDICT #7).

The axon tunnel platform retains ~transferred-bytes per H2D call (pinned
tracker-free in docs/axon_h2d_retention.md — a platform-client issue). The
invariant the framework OWNS is that the CPU backend stays clean: if this
test starts failing, the framework (or a jax upgrade) introduced a real
per-transfer retainer that the platform issue can no longer excuse.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cpu_backend_retains_nothing_per_transfer():
    # fresh subprocess: backend forcing must precede any JAX use, and this
    # process's allocator state (a whole test session) would drown the signal
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "leak_probe.py"), "cpu"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["backend"] == "cpu"
    for trial in out["trials"]:
        # clean = well under the transferred size (axon retains ~100%+2KB);
        # allow 8% of the buffer + 4 KB of allocator/arena noise
        bound = 0.08 * trial["buffer_kb"] + 4.0
        assert trial["retained_kb_per_call"] < bound, trial
