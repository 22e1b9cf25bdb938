"""Hardware-gated tests: run only with PAWS_TPU_TESTS=1 (a real TPU attached).

The regular suite pins JAX to CPU (conftest.py) and exercises the Pallas
kernels in interpret mode; these tests spawn subprocesses WITHOUT the CPU pin
so the fused kernels compile and run on the actual chip. The production path
also pins parity at runtime (pipeline.pick_bounded_engine asserts pallas ==
xla positions on hardware before persisting an engine decision); this test
makes that check invocable from CI on TPU runners.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("PAWS_TPU_TESTS") != "1",
    reason="hardware tests need PAWS_TPU_TESTS=1 and an attached TPU",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, timeout: int = 900) -> str:
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    # experimental platforms (the tunneled-TPU "axon" plugin) are only
    # selected when explicitly named, so restore the launch-time selection
    # instead of merely unsetting the conftest CPU pin
    orig = os.environ.get("PAWS_ORIG_JAX_PLATFORMS")
    if orig and orig != "cpu":
        env["JAX_PLATFORMS"] = orig
    # PREPEND the repo: the launch PYTHONPATH may carry the TPU plugin's
    # registration hook (e.g. the axon plugin's site dir) — don't clobber it
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "") if env.get("PYTHONPATH") else REPO
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=timeout, env=env
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def test_pallas_xla_parity_on_hardware():
    out = _run(
        """
import json
import jax
assert jax.default_backend() == "tpu", jax.default_backend()
from pawsometracker_tpu.models.dog_tracker import make_spec
from pawsometracker_tpu.pipeline import roi_geometry, pick_bounded_engine
spec = make_spec((1080, 1920), 41, 25, True)
ch, cw, _ = roi_geometry(spec, 8, 1, "predict")
engine, info = pick_bounded_engine(make_spec((ch, cw), 41, 25, True), 8)
print(json.dumps({"engine": engine, "info": info}))
"""
    )
    res = json.loads(out.strip().splitlines()[-1])
    # a cached decision carries parity=True from its original measurement;
    # "reason" appears only when pallas failed to build — treat as failure here
    assert res["info"].get("parity") is True, res


def test_tie_stress_parity_measured_on_hardware():
    """The engine measurement must run the argmax-TIE geometries (flat field,
    mirror-symmetric blob) on the chip and record the outcome: either both
    engines agree on ties (tie_parity True — pallas may win) or the
    environment is pinned to XLA (VERDICT r3 item 5: BENCH_r02's 0.091 px
    under pallas came from tie geometries the old probe never tested)."""
    out = _run(
        """
import json, os
import jax
assert jax.default_backend() == "tpu", jax.default_backend()
# force a FRESH measurement (bypass the persisted decision cache)
os.environ["PAWSOMETRACKER_CACHE"] = os.path.join(os.environ.get("TMPDIR", "/tmp"), "paws_tie_test_cache")
import shutil; shutil.rmtree(os.environ["PAWSOMETRACKER_CACHE"], ignore_errors=True)
from pawsometracker_tpu.models.dog_tracker import make_spec
from pawsometracker_tpu.pipeline import roi_geometry, pick_bounded_engine
spec = make_spec((1080, 1920), 41, 25, True)
ch, cw, _ = roi_geometry(spec, 8, 1, "predict")
engine, info = pick_bounded_engine(make_spec((ch, cw), 41, 25, True), 8)
print(json.dumps({"engine": engine, "info": info}))
"""
    )
    res = json.loads(out.strip().splitlines()[-1])
    info = res["info"]
    assert info.get("parity") is True, res
    assert "tie_parity" in info, res  # the tie stress actually ran
    if res["engine"] == "pallas":
        # pallas may only win when it matches XLA's tie-breaks
        assert info["tie_parity"] is True, res


def test_full_frame_pallas_scan_matches_xla_on_hardware():
    _run(
        """
import numpy as np
import jax, jax.numpy as jnp
assert jax.default_backend() == "tpu"
from pawsometracker_tpu.models.dog_tracker import make_spec, tracker_fns
from pawsometracker_tpu.ops.pallas_tracker import pallas_scan_fn
spec = make_spec((240, 320), 21, 10, True)
rng = np.random.default_rng(3)
frames = rng.integers(0, 255, size=(8, 240, 320)).astype(np.uint8)
frames[:, 100:108, 150:158] = 0
pos0 = jnp.asarray(np.array([100, 150], np.int32))
out_x = np.asarray(tracker_fns(spec).scan(frames, pos0, np.uint8(128)))
out_p = np.asarray(pallas_scan_fn(spec)(frames, pos0, np.uint8(128)))
assert np.array_equal(out_x, out_p), (out_x, out_p)
print("ok")
"""
    )


def test_batched_bounded_engine_measurement_on_hardware():
    """pick_bounded_engine_batch (the batch/multi ROI-path chooser) must
    measure with batch parity asserted on the chip."""
    out = _run(
        """
import json
import jax
assert jax.default_backend() == "tpu", jax.default_backend()
from pawsometracker_tpu.models.dog_tracker import make_spec
from pawsometracker_tpu.pipeline import roi_geometry, pick_bounded_engine_batch
spec = make_spec((1080, 1920), 41, 25, True)
ch, cw, _ = roi_geometry(spec, 8, 1, "predict")
engine, info = pick_bounded_engine_batch(make_spec((ch, cw), 41, 25, True), 8, 4)
print(json.dumps({"engine": engine, "info": info}))
"""
    )
    res = json.loads(out.strip().splitlines()[-1])
    assert res["info"].get("parity") is True, res


def test_subpixel_engine_measurement_on_hardware():
    """The subpixel engine is also a measured choice on the chip: the fused
    bounded+subpixel kernel must hold position parity (exact) and offset
    closeness against the XLA scan_sub before it can win."""
    out = _run(
        """
import json
import jax
assert jax.default_backend() == "tpu", jax.default_backend()
from pawsometracker_tpu.models.dog_tracker import make_spec
from pawsometracker_tpu.pipeline import roi_geometry, pick_bounded_engine
spec = make_spec((1080, 1920), 41, 25, True)
ch, cw, _ = roi_geometry(spec, 8, 1, "predict")
engine, info = pick_bounded_engine(make_spec((ch, cw), 41, 25, True), 8, subpixel=True)
print(json.dumps({"engine": engine, "info": info}))
"""
    )
    res = json.loads(out.strip().splitlines()[-1])
    assert res["info"].get("parity") is True, res


def test_out_of_crop_start_defined_on_hardware():
    """The bounded kernel's entry clamp (mispredict chained starts) must hold
    on the COMPILED kernel: interpret mode clamps OOB slices silently, so
    only hardware can prove the DMA origin math never leaves the buffer."""
    _run(
        """
import numpy as np
import jax, jax.numpy as jnp
assert jax.default_backend() == "tpu"
from pawsometracker_tpu.models.dog_tracker import make_spec
from pawsometracker_tpu.ops.pallas_tracker import pallas_scan_fn
ch = cw = 97
K = 4
spec = make_spec((ch, cw), 21, 8, True)
crops = np.full((K, ch, cw), 128, np.uint8)
crops[:, 44:53, 44:53] = 0
fn = pallas_scan_fn(spec, bounded=True)
deltas = np.zeros((K, 2), np.int32)
lo = np.zeros((K, 2), np.int32)
hi = np.tile(np.array([[ch - 1, cw - 1]], np.int32), (K, 1))
for start in [(-50, -120), (300, 48), (48, 500)]:
    got = np.asarray(fn(jnp.asarray(crops), jnp.array(start, np.int32),
                        np.uint8(128), deltas, lo, hi))
    assert (got >= 0).all() and (got[:, 0] < ch).all() and (got[:, 1] < cw).all(), (start, got)
print("ok")
"""
    )


def test_grouped_super_program_parity_on_hardware():
    """The S=3 super-program (group dispatch) must produce the same positions
    as three consecutive per-chunk chained dispatches on the real chip."""
    out = _run(
        """
import json
import numpy as np
import jax
import jax.numpy as jnp
assert jax.default_backend() == "tpu", jax.default_backend()
from pawsometracker_tpu.models.dog_tracker import make_spec, tracker_fns
from pawsometracker_tpu.pipeline import make_chained, make_super_chain, roi_geometry
spec = make_spec((1080, 1920), 41, 25, True)
ch, cw, _ = roi_geometry(spec, 8, 1, "predict")
rs = make_spec((ch, cw), 41, 25, True)
fns = tracker_fns(rs)
chain = make_chained(fns.scan_bounded)
rng = np.random.default_rng(3)
yy, xx = np.mgrid[:ch, :cw]
crops = []
for s in range(4):
    bi, bj = ch // 2 + 5 * s, cw // 2 - 3 * s
    blob = np.exp(-((yy - bi) ** 2 + (xx - bj) ** 2) / (2 * 9.0 ** 2))
    frame = np.clip(128 - 110 * blob, 0, 255).astype(np.uint8)
    crops.append(np.broadcast_to(frame, (8, ch, cw)).copy())
K = 8
pos = jnp.asarray(np.array([ch // 2, cw // 2], np.int32))
deltas = np.zeros((K, 2), np.int32)
lo = np.zeros((K, 2), np.int32)
hi = np.tile(np.array([[ch - 1, cw - 1]], np.int32), (K, 1))
f = np.uint8(128)
kk = np.int32(K)
out0 = fns.scan_bounded(crops[0], pos, f, deltas, lo, hi)
seq = [np.asarray(out0)]
prev = out0
for s in range(1, 4):
    prev = chain(crops[s], prev, kk, f, deltas, lo, hi)
    seq.append(np.asarray(prev))
sup3 = make_super_chain(fns.scan_bounded, 3, False)
outs = sup3(tuple(jnp.asarray(c) for c in crops[1:]), out0, kk,
            np.full(3, K, np.int32), np.tile(deltas[None], (3, 1, 1)), f,
            np.tile(lo[None], (3, 1, 1)), np.tile(hi[None], (3, 1, 1)))
match = all(np.array_equal(np.asarray(outs[s - 1]), seq[s]) for s in range(1, 4))
print(json.dumps({"match": bool(match)}))
"""
    )
    res = json.loads(out.strip().splitlines()[-1])
    assert res["match"] is True, res


def test_randomized_tie_geometries_parity_on_hardware():
    """Compiled-kernel version of the randomized tie fuzz: the COMPILED
    pallas reduction order (not interpret mode's XLA dots) must agree with
    the XLA scan on random tie geometries — flat fields, centered symmetric
    blobs, square plateaus, mirror-duplicated noise."""
    out = _run(
        """
import numpy as np
import jax, jax.numpy as jnp
assert jax.default_backend() == "tpu", jax.default_backend()
from pawsometracker_tpu.models.dog_tracker import make_spec, tracker_fns
from pawsometracker_tpu.ops.pallas_tracker import pallas_scan_fn
ch = cw = 41
K = 4
spec = make_spec((ch, cw), 15, 6, True)
fns = tracker_fns(spec)
pal = pallas_scan_fn(spec, bounded=True)
deltas = np.zeros((K, 2), np.int32)
lo = np.zeros((K, 2), np.int32)
hi = np.tile(np.array([[ch - 1, cw - 1]], np.int32), (K, 1))
pos = jnp.asarray(np.array([ch // 2, cw // 2], np.int32))
f = np.uint8(128)
yy, xx = np.mgrid[:ch, :cw]
rng = np.random.default_rng(17)
mism = 0
for trial in range(8):
    kind = trial % 4
    if kind == 0:
        fr = np.full((ch, cw), int(rng.integers(0, 256)), np.uint8)
    elif kind == 1:
        b = np.exp(-((yy - ch // 2) ** 2 + (xx - cw // 2) ** 2)
                   / (2.0 * float(rng.uniform(1.5, 6)) ** 2))
        fr = np.clip(128 - float(rng.uniform(40, 120)) * b, 0, 255).astype(np.uint8)
    elif kind == 2:
        fr = np.full((ch, cw), 128, np.uint8)
        s = int(rng.integers(2, 8))
        i0, j0 = int(rng.integers(5, ch - 10)), int(rng.integers(5, cw - 10))
        fr[i0:i0 + s, j0:j0 + s] = 20
    else:
        half = rng.integers(0, 256, size=(ch, cw // 2 + 1)).astype(np.uint8)
        fr = np.concatenate([half[:, :-1], half[:, ::-1][:, :cw - cw // 2]],
                            axis=1)[:, :cw]
    crops = np.broadcast_to(np.ascontiguousarray(fr), (K, ch, cw)).copy()
    ox = np.asarray(fns.scan_bounded(jnp.asarray(crops), pos, f, deltas, lo, hi))
    op = np.asarray(pal(jnp.asarray(crops), pos, f, deltas, lo, hi))
    if not np.array_equal(ox, op):
        mism += 1
print("MISMATCHES", mism)
"""
    )
    last = [l for l in out.strip().splitlines() if l.startswith("MISMATCHES")][-1]
    # the tie gate pins XLA when the compiled orders diverge, so divergence
    # here is tolerable in production — but the test RECORDS it loudly:
    # today's chip agrees (0 mismatches measured); if this ever flips, the
    # engine gate (tie_parity) is what guards users.
    assert last == "MISMATCHES 0", last
