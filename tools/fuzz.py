"""Randomized differential fuzzing for the decode and pipeline invariants.

Three campaigns, each checking a strong equality invariant on randomly
generated content and parameters (all CPU-runnable):

- ``streams``: random VFR pts streams (jitter, stalls, bursts) at random
  output rates / span sizes / worker counts — ``ParallelNativeSource`` must
  equal the sequential ``NativeFrameSource`` bit-for-bit (aligned spans or
  verified fallback). This campaign found the skipped-leading-slot and
  fractional-stop count bugs fixed in the history.
- ``params``: random clips x random ``track()`` parameter combinations —
  ``stream="roi"`` (any depth/K/speculate/subpixel) must equal
  ``stream="full"`` exactly, and invalid windows must raise the same way.
- ``retained``: random interleavings of the retained-ROI protocol
  (advance/crop/recrop/release with random origins and crop shapes) — the
  C++ ring and the Python span retention must agree crop-for-crop.
- ``batch``: random multi-video configurations — every ``track_batch`` result
  must equal its per-video ``track()``, and ``track_multi`` over separated
  targets must equal per-target single tracks.

Usage:
    python tools/fuzz.py [streams|params|retained|batch|all] [--seeds N] [--base B]

Exits non-zero on any divergence, printing the seed for a deterministic repro.
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _all_frames(src, chunk):
    out = []
    while True:
        c = src.read_chunk(chunk)
        if c.shape[0] == 0:
            break
        out.extend(np.array(c))
        if c.shape[0] < chunk:
            break
    return np.stack(out) if out else np.empty((0, 1, 1), np.uint8)


def _vfr_clip(rng, d):
    from pawsometracker_tpu.io import native_io

    path = os.path.join(d, "f.mp4")
    w = native_io.NativeVFRWriter(path, 64, 48)
    t, k = 0.0, 0
    dur = rng.uniform(2.0, 6.0)
    while t < dur and k < 260:
        img = np.full((48, 64), 128, np.uint8)
        img[:12, :12] = (k * 13) % 256
        if rng.random() < 0.5:
            img[30:42, 30:42] = (k * 3) % 256
        w.write(img, t)
        k += 1
        r = rng.random()
        if r < 0.06:
            t += rng.uniform(0.3, 1.5)  # stall
        elif r < 0.25:
            t += rng.uniform(0.001, 0.012)  # burst
        else:
            t += rng.uniform(0.015, 0.1)  # jitter
    w.release()
    return path, dur


def _cfr_clip(rng, d):
    """CFR h264 counter clip at a random native rate — downsampled decode of
    these exercises the fps-downsampling packet skip (drop-fated nonref
    packets never decoded) under random span/entry geometry."""
    from pawsometracker_tpu.io import native_io

    path = os.path.join(d, "c.mp4")
    native = float(rng.choice([24, 30, 48, 60]))
    n = int(rng.integers(60, 220))
    w = native_io.NativeVideoWriter(path, 64, 48, native)
    for k in range(n):
        img = np.full((48, 64), 128, np.uint8)
        img[:12, :12] = (k * 13) % 256
        img[30:42, (k * 2) % 50 : (k * 2) % 50 + 10] = (k * 3) % 256
        w.write(img)
    w.release()
    return path, n / native


def fuzz_streams(seeds, base) -> int:
    from pawsometracker_tpu.io import native_io
    from pawsometracker_tpu.io.parallel_decode import ParallelNativeSource

    fails = 0
    for seed in range(seeds):
        rng = np.random.default_rng(base + seed)
        with tempfile.TemporaryDirectory() as d:
            if rng.random() < 0.5:
                path, dur = _cfr_clip(rng, d)  # skip-active when downsampled
            else:
                path, dur = _vfr_clip(rng, d)  # skip self-disables (CFR check)
            fps = float(rng.choice([10, 12, 18, 24, 25, 30, 48]))
            start = float(rng.choice([0.0, 0.0, rng.uniform(0, dur / 2)]))
            stop = float(rng.choice([np.inf, dur * rng.uniform(0.5, 1.2)]))
            kw = dict(start=start, stop=stop, fps=fps)
            with native_io.NativeFrameSource(path, **kw) as ref:
                want = _all_frames(ref, 13)
            par = ParallelNativeSource(
                path,
                workers=int(rng.integers(2, 6)),
                span_frames=int(rng.integers(4, 24)),
                keyframe_align=bool(rng.integers(0, 2)),
                **kw,
            )
            try:
                got = _all_frames(par, int(rng.integers(1, 30)))
            finally:
                par.close()
            if got.shape != want.shape or not np.array_equal(got, want):
                fails += 1
                print(f"streams seed {base + seed}: {got.shape} vs {want.shape} {kw}")
    print(f"streams: {fails} failures / {seeds}")
    return fails


def fuzz_params(seeds, base) -> int:
    import cv2

    from pawsometracker_tpu import IJ, track

    fails = 0
    for seed in range(seeds):
        rng = np.random.default_rng(base + seed)
        H = int(rng.integers(60, 260))
        W = int(rng.integers(60, 340))
        T = int(rng.integers(3, 70))
        tw = float(rng.choice([4, 6, 10, 14, 25]))
        r = max(2, int(tw) // 2)
        dark = bool(rng.integers(0, 2))
        i, j = int(rng.integers(r, H - r)), int(rng.integers(r, W - r))
        start_ij = (i, j)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "f.avi")
            vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"FFV1"), 24, (W, H), isColor=False)
            for _ in range(T):
                f = np.full((H, W), 128, np.uint8)
                cv2.circle(f, (j, i), r, 0 if dark else 255, -1)
                vw.write(f)
                i = int(np.clip(i + rng.integers(-7, 8), 0, H - 1))
                j = int(np.clip(j + rng.integers(-7, 8), 0, W - 1))
            vw.release()
            kw = dict(
                start_location=IJ(*start_ij),
                target_width=tw,
                # scalar and rectangular (w, h) windows — rectangular shapes
                # pin the single-point (w, h)->(rows, cols) normalization
                window_size=(
                    (int(rng.choice([17, 31, 41])), int(rng.choice([9, 21, 31])))
                    if rng.random() < 0.4
                    else int(rng.choice([17, 21, 31, 41]))
                ),
                darker_target=dark,
                fps=float(rng.choice([12, 24, 48])),
            )
            if rng.random() < 0.3:
                kw["start"] = float(rng.uniform(0, T / 48))
            if rng.random() < 0.4:
                kw["stop"] = float(rng.uniform(0.2, T / 24 + 0.5))
            if rng.random() < 0.3:
                kw["subpixel"] = True
            try:
                _, full = track(path, stream="full", **kw)
            except (ValueError, EOFError):
                try:
                    track(path, stream="roi", **kw)
                    fails += 1
                    print(f"params seed {base + seed}: full raised, roi did not")
                except (ValueError, EOFError):
                    pass
                continue
            # NB: rng.choice on a mixed-type list stringifies everything —
            # draw the type first
            depth = "auto" if rng.random() < 0.2 else int(rng.integers(0, 4))
            roi_kw = dict(
                kw,
                stream="roi",
                pipeline_depth=depth,
                roi_frames=int(rng.choice([2, 4, 8, 16])),
            )
            if depth != 0 and rng.random() < 0.3:
                roi_kw["speculate"] = "contain"
            try:
                _, roi = track(path, **roi_kw)
            except Exception as e:
                # a roi-only failure is exactly the divergence class this
                # campaign hunts — record the seed, don't kill the campaign
                fails += 1
                print(f"params seed {base + seed}: roi raised {e!r} (full ok) {roi_kw}")
                continue
            if not np.array_equal(np.asarray(roi), np.asarray(full)):
                fails += 1
                print(f"params seed {base + seed}: roi != full {roi_kw}")
            if rng.random() < 0.5:
                # async dispatch worker vs inline dispatch: bit-identical by
                # construction (FIFO) — this pins it against thread bugs.
                # Force the modes explicitly (an ambient PAWS_SYNC_DISPATCH=1
                # would make the differential vacuous) and restore after.
                prior = os.environ.get("PAWS_SYNC_DISPATCH")
                try:
                    os.environ["PAWS_SYNC_DISPATCH"] = "0"  # forced async
                    _, roi_async = track(path, **roi_kw)
                    os.environ["PAWS_SYNC_DISPATCH"] = "1"  # forced inline
                    _, roi_sync = track(path, **roi_kw)
                finally:
                    if prior is None:
                        os.environ.pop("PAWS_SYNC_DISPATCH", None)
                    else:
                        os.environ["PAWS_SYNC_DISPATCH"] = prior
                if not np.array_equal(np.asarray(roi_sync), np.asarray(roi_async)):
                    fails += 1
                    print(f"params seed {base + seed}: async != sync dispatch {roi_kw}")
            if rng.random() < 0.4:
                # group dispatch (S chunk scans coalesced into one jitted
                # program) vs per-chunk dispatch: bit-identical by
                # construction (same inner scan, same chaining math)
                prior = os.environ.get("PAWS_DISPATCH_GROUP")
                try:
                    os.environ["PAWS_DISPATCH_GROUP"] = str(int(rng.integers(2, 5)))
                    _, roi_grp = track(path, **roi_kw)
                finally:
                    if prior is None:
                        os.environ.pop("PAWS_DISPATCH_GROUP", None)
                    else:
                        os.environ["PAWS_DISPATCH_GROUP"] = prior
                if not np.array_equal(np.asarray(roi_grp), np.asarray(roi)):
                    fails += 1
                    print(f"params seed {base + seed}: grouped != per-chunk dispatch {roi_kw}")
    print(f"params: {fails} failures / {seeds}")
    return fails


def fuzz_retained(seeds, base) -> int:
    from pawsometracker_tpu.io import native_io
    from pawsometracker_tpu.io.parallel_decode import ParallelNativeSource

    fails = 0
    for seed in range(seeds):
        rng = np.random.default_rng(base + seed)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "r.mp4")
            T = int(rng.integers(40, 120))
            w = native_io.NativeVideoWriter(path, 96, 64, 24)
            for t in range(T):
                img = np.full((64, 96), 128, np.uint8)
                img[:12, :12] = (t * 7) % 256
                img[40:52, 40 + (t % 40) : min(52 + (t % 40), 96)] = 30
                w.write(img)
            w.release()
            ring = native_io.NativeFrameSource(path, fps=24, prefetch=64)
            par = ParallelNativeSource(path, fps=24, workers=3, span_frames=int(rng.integers(5, 20)))
            bad = False
            try:
                retained = 0
                for _ in range(40):
                    op = rng.choice(["adv", "crop", "recrop", "rel"])
                    if op == "adv":
                        n = int(rng.integers(1, 6))
                        if ring.advance_retained(n) != par.advance_retained(n):
                            bad = True
                            break
                        retained = len(par._retained)
                    elif op == "crop":
                        n = int(rng.integers(1, 6))
                        o = (int(rng.integers(-20, 60)), int(rng.integers(-20, 80)))
                        ch, cw = int(rng.integers(8, 50)), int(rng.integers(8, 70))
                        a = ring.read_roi_chunk_retained(n, o, ch, cw, 99)
                        b = par.read_roi_chunk_retained(n, o, ch, cw, 99)
                        if not np.array_equal(a, b):
                            bad = True
                            break
                        retained = len(par._retained)
                    elif op == "recrop" and retained > 0:
                        first = int(rng.integers(0, retained))
                        k = int(rng.integers(1, retained - first + 1))
                        o = (int(rng.integers(-20, 60)), int(rng.integers(-20, 80)))
                        ch, cw = int(rng.integers(8, 50)), int(rng.integers(8, 70))
                        if not np.array_equal(
                            ring.recrop(first, k, o, ch, cw, 99),
                            par.recrop(first, k, o, ch, cw, 99),
                        ):
                            bad = True
                            break
                    elif op == "rel" and retained > 0:
                        n = int(rng.integers(1, retained + 1))
                        ring.release(n)
                        par.release(n)
                        retained -= n
                    if retained > 40:  # keep the C++ ring within capacity
                        ring.release(retained - 20)
                        par.release(retained - 20)
                        retained = 20
            finally:
                ring.close()
                par.close()
            if bad:
                fails += 1
                print(f"retained seed {base + seed}: divergence")
    print(f"retained: {fails} failures / {seeds}")
    return fails


def fuzz_batch(seeds, base) -> int:
    import cv2

    from pawsometracker_tpu import IJ, track
    from pawsometracker_tpu.batch import track_batch
    from pawsometracker_tpu.multi import track_multi

    fails = 0
    for seed in range(seeds):
        rng = np.random.default_rng(base + seed)
        with tempfile.TemporaryDirectory() as d:
            B = int(rng.integers(2, 5))
            H, W = int(rng.integers(90, 200)), int(rng.integers(120, 280))
            files, starts = [], []
            for b in range(B):
                T = int(rng.integers(8, 50))
                i, j = int(rng.integers(10, H - 10)), int(rng.integers(10, W - 10))
                starts.append((i, j))
                path = os.path.join(d, f"v{b}.avi")
                vw = cv2.VideoWriter(
                    path, cv2.VideoWriter_fourcc(*"FFV1"), 24, (W, H), isColor=False
                )
                for _ in range(T):
                    f = np.full((H, W), 128, np.uint8)
                    cv2.circle(f, (j, i), 5, 0, -1)
                    vw.write(f)
                    i = int(np.clip(i + rng.integers(-6, 7), 0, H - 1))
                    j = int(np.clip(j + rng.integers(-6, 7), 0, W - 1))
                vw.release()
                files.append(path)
            kw = dict(target_width=10, fps=24)
            if rng.random() < 0.3:
                kw["subpixel"] = True
            if rng.random() < 0.3:
                kw["pipeline_depth"] = int(rng.integers(0, 4))
            locs = [IJ(*s0) for s0 in starts]
            results = track_batch(files, start_location=locs, **kw)
            for f, loc, (ts, ij) in zip(files, locs, results):
                _, want = track(f, start_location=loc, **kw)
                if not np.array_equal(np.asarray(ij), np.asarray(want)):
                    fails += 1
                    print(f"batch seed {base + seed}: {f} != single {kw}")
                    break
            # multi: two separated targets in one frame must equal singles
            if H >= 120 and W >= 160:
                p1, p2 = (H // 4, W // 4), (3 * H // 4, 3 * W // 4)
                path = os.path.join(d, "m.avi")
                vw = cv2.VideoWriter(
                    path, cv2.VideoWriter_fourcc(*"FFV1"), 24, (W, H), isColor=False
                )
                T = int(rng.integers(8, 40))
                q1, q2 = list(p1), list(p2)
                for _ in range(T):
                    f = np.full((H, W), 128, np.uint8)
                    cv2.circle(f, (q1[1], q1[0]), 5, 0, -1)
                    cv2.circle(f, (q2[1], q2[0]), 5, 0, -1)
                    vw.write(f)
                    q1[0] = int(np.clip(q1[0] + rng.integers(-4, 5), 0, H // 2))
                    q1[1] = int(np.clip(q1[1] + rng.integers(-4, 5), 0, W // 2))
                    q2[0] = int(np.clip(q2[0] + rng.integers(-4, 5), H // 2, H - 1))
                    q2[1] = int(np.clip(q2[1] + rng.integers(-4, 5), W // 2, W - 1))
                vw.release()
                mkw = dict(target_width=10, fps=24)
                _, pos = track_multi(path, [IJ(*p1), IJ(*p2)], **mkw)
                _, w1 = track(path, start_location=IJ(*p1), **mkw)
                _, w2 = track(path, start_location=IJ(*p2), **mkw)
                if not (np.array_equal(pos[:, 0], w1) and np.array_equal(pos[:, 1], w2)):
                    fails += 1
                    print(f"batch seed {base + seed}: multi != singles")
    print(f"batch: {fails} failures / {seeds}")
    return fails


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which.startswith("--"):
        which = "all"  # flags-only invocation: run everything
    if which not in ("streams", "params", "retained", "batch", "all"):
        # a typo must not exit 0 having fuzzed nothing (silent false-green)
        print(f"unknown campaign {which!r}: pick streams|params|retained|batch|all",
              file=sys.stderr)
        return 2
    seeds = int(sys.argv[sys.argv.index("--seeds") + 1]) if "--seeds" in sys.argv else 20
    base = int(sys.argv[sys.argv.index("--base") + 1]) if "--base" in sys.argv else 1000
    if which in ("params", "batch", "all"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    total = 0
    if which in ("streams", "all"):
        total += fuzz_streams(seeds, base)
    if which in ("params", "all"):
        total += fuzz_params(seeds, base)
    if which in ("retained", "all"):
        total += fuzz_retained(seeds, base)
    if which in ("batch", "all"):
        total += fuzz_batch(seeds, base)
    return 1 if total else 0


if __name__ == "__main__":
    raise SystemExit(main())
