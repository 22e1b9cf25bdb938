"""Command-line interface: ``python -m pawsometracker_tpu [files...]``.

The reference exposes only a library function; this CLI wraps the same
``track`` API for shell pipelines. Output is CSV (``t,row,col``) on stdout or
``--out results.npz``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _window_size(s: str):
    """``"21"`` -> 21; ``"61x9"`` -> (61, 9) in the reference's (w, h)
    convention (reference: src/PawsomeTracker.jl:70-72)."""
    if "x" in s.lower():
        w, h = s.lower().split("x", 1)
        return (int(w), int(h))
    return int(s)


def build_parser() -> argparse.ArgumentParser:
    """The CLI argument parser (exposed for --help docs generation)."""
    p = argparse.ArgumentParser(
        prog="pawsometracker_tpu",
        description="Track a single blob-like target through video file(s) with a DoG matched filter.",
    )
    p.add_argument("files", nargs="+", help="video file, or consecutive segments of one recording")
    p.add_argument("--start", type=float, default=None, help="start time (s)")
    p.add_argument("--stop", type=float, default=None, help="stop time (s)")
    p.add_argument("--fps", type=float, default=24, help="tracking sample rate")
    p.add_argument("--target-width", type=float, default=25, help="target diameter (px, FWHM)")
    p.add_argument("--window-size", type=_window_size, default=None, metavar="L|WxH",
                   help="search window: edge length for a square window, or WxH "
                        "(reference (w, h) convention, e.g. 61x9)")
    p.add_argument("--lighter-target", action="store_true", help="target is lighter than background")
    p.add_argument("--start-ij", type=int, nargs=2, metavar=("ROW", "COL"), default=None,
                   help="raw 0-based start index")
    p.add_argument("--start-xy", type=int, nargs=2, metavar=("X", "Y"), default=None,
                   help="display-pixel start coordinates")
    p.add_argument("--diagnostic-file", default=None, help="write a 640x360 overlay video here")
    p.add_argument("--sar", type=float, default=None, help="override sample aspect ratio")
    p.add_argument("--backend", default="auto", choices=["auto", "native", "opencv"])
    p.add_argument("--engine", default="auto", choices=["auto", "pallas", "xla"])
    p.add_argument("--stream", default="auto", choices=["auto", "roi", "full"])
    p.add_argument("--pipeline-depth", type=lambda s: s if s == "auto" else int(s),
                   default="auto",
                   help="chunks the host runs ahead of the device (0 = synchronous; "
                        "'auto' adapts from the measured drain latency)")
    p.add_argument("--speculate", default="predict", choices=["predict", "contain"],
                   help="ROI crop aiming strategy")
    p.add_argument("--roi-frames", type=int, default=None, help="frames per ROI mini-chunk")
    p.add_argument("--subpixel", action="store_true",
                   help="parabolic peak refinement (float positions)")
    p.add_argument("--decode-workers", type=int, default=None,
                   help="cooperating native decoders per video (bit-identical; "
                        "default: the PAWSIO_DECODE_WORKERS env var)")
    p.add_argument("--checkpoint", default=None, help="checkpoint path for resumable tracking")
    p.add_argument("--out", default=None, help="write results to this .npz instead of CSV stdout")
    p.add_argument("--format", default="csv", choices=["csv", "json"], help="stdout format")
    return p


def main(argv=None) -> int:
    """CLI entry point; returns a process exit code."""
    args = build_parser().parse_args(argv)
    from . import IJ, track, track_resumable

    if args.start_ij is not None and args.start_xy is not None:
        print("error: give at most one of --start-ij / --start-xy", file=sys.stderr)
        return 2
    loc = None
    if args.start_ij is not None:
        loc = IJ(*args.start_ij)
    elif args.start_xy is not None:
        loc = tuple(args.start_xy)

    kwargs = dict(
        start=args.start,
        stop=args.stop,
        fps=args.fps,
        target_width=args.target_width,
        window_size=args.window_size,
        darker_target=not args.lighter_target,
        start_location=loc,
        diagnostic_file=args.diagnostic_file,
        sar=args.sar,
        backend=args.backend,
        engine=args.engine,
        stream=args.stream,
        pipeline_depth=args.pipeline_depth,
        speculate=args.speculate,
        roi_frames=args.roi_frames,
        subpixel=args.subpixel,
        decode_workers=args.decode_workers,
    )
    try:
        if args.checkpoint:
            if len(args.files) != 1:
                print("error: --checkpoint supports a single file", file=sys.stderr)
                return 2
            cp_kwargs = dict(kwargs)  # forward EVERY tracking flag
            cp_kwargs.pop("diagnostic_file")  # not supported by slices
            cp_kwargs["start"] = args.start or 0.0
            ts, ij = track_resumable(
                args.files[0], checkpoint_path=args.checkpoint, **cp_kwargs
            )
        else:
            target = args.files if len(args.files) > 1 else args.files[0]
            ts, ij = track(target, **kwargs)
    except (IOError, EOFError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    if args.out:
        import numpy as np

        np.savez(args.out, ts=ts, ij=ij)
        print(f"wrote {len(ij)} positions to {args.out}", file=sys.stderr)
    elif args.format == "json":
        cast = float if args.subpixel else int
        print(json.dumps({"ts": [float(t) for t in ts], "ij": [[cast(a), cast(b)] for a, b in ij]}))
    else:
        print("t,row,col")
        for t, (i, j) in zip(ts, ij):
            print(f"{t:.6f},{i},{j}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
