"""ctypes bindings for the native libav I/O layer (``io/native/pawsio.cpp``).

``NativeFrameSource`` implements the same interface and semantics as
:class:`.decode.OpenCVFrameSource` (same ffmpeg fps-filter resampling — the
state machine is implemented twice, once per language, and cross-checked by
tests) but decodes straight to GRAY8 with swscale like the reference's
``openvideo(..., target_format=AV_PIX_FMT_GRAY8)`` (reference:
src/PawsomeTracker.jl:157), and runs an in-process decode-ahead thread with a
bounded frame ring.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import threading
from fractions import Fraction

import numpy as np

from .decode import VideoInfo

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(_HERE, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libpawsio.so")

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False

# serializes fast-decode requests around decoder opens on STALE prebuilt
# .so's that predate pawsio_open3 (the current library carries the request
# per-open, lock-free): there the setting is process-global in the .so (or
# the environment, before pawsio_set_fast_decode), so concurrent opens with
# DIFFERENT fast settings must not interleave set/open/reset windows
_fast_lock = threading.Lock()


class _FastDecodeRequest:
    """Apply a per-open fast-decode request around a native decoder open —
    the degradation path for stale prebuilt .so's without ``pawsio_open3``.

    ``fast=None`` leaves the setting alone (the PAWSIO_FAST_DECODE env var
    keeps ruling) but still serializes on the lock: the override is
    process-global, so an unqualified open racing an explicit request's
    set/open/reset window would otherwise inherit the other open's setting.
    With the current .so the request goes through ``pawsio_set_fast_decode``
    (an atomic int — safe against concurrent getenv); a stale prebuilt .so
    falls back to setting the env var for the duration of the open, which the
    C++ side reads at avcodec_open2 time either way. That env fallback
    mutates ``os.environ`` around the open: POSIX makes getenv during a
    concurrent setenv undefined, so while pawsio opens themselves are
    serialized on the lock, unrelated threads calling getenv (libav, other
    native libs) could in principle race the window. This is an accepted
    degradation path for stale builds only — thread-heavy processes should
    rebuild the .so (delete ``libpawsio.so`` to trigger it) rather than rely
    on the env window.
    """

    def __init__(self, lib, fast: bool | None):
        self._lib = lib
        self._fast = fast
        self._env_prev: str | None = None

    def __enter__(self):
        _fast_lock.acquire()
        if self._fast is None:
            return self
        if hasattr(self._lib, "pawsio_set_fast_decode"):
            self._lib.pawsio_set_fast_decode(1 if self._fast else 0)
        else:
            self._env_prev = os.environ.get("PAWSIO_FAST_DECODE")
            os.environ["PAWSIO_FAST_DECODE"] = "1" if self._fast else "0"
        return self

    def __exit__(self, *exc):
        try:
            if self._fast is None:
                return False
            if hasattr(self._lib, "pawsio_set_fast_decode"):
                self._lib.pawsio_set_fast_decode(-1)
            elif self._env_prev is None:
                os.environ.pop("PAWSIO_FAST_DECODE", None)
            else:
                os.environ["PAWSIO_FAST_DECODE"] = self._env_prev
        finally:
            _fast_lock.release()
        return False


class _PawsInfo(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
        ("fps", ctypes.c_double),
        ("sar_num", ctypes.c_int32),
        ("sar_den", ctypes.c_int32),
        ("nframes", ctypes.c_int64),
    ]


def _build() -> bool:
    try:
        r = subprocess.run(
            ["make", "-C", _NATIVE_DIR, "libpawsio.so"],
            capture_output=True,
            text=True,
            timeout=300,
        )
        return r.returncode == 0 and os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load():
    global _lib, _build_attempted
    with _lib_lock:
        if _lib is not None:
            return _lib
        # run make even when a .so exists: the build is dependency-driven, so
        # this is a cheap no-op when fresh and transparently rebuilds a STALE
        # .so after a source update (per-frame-origin entry points etc.);
        # environments without a toolchain keep the existing .so (the ctypes
        # layer degrades per optional symbol)
        if not _build_attempted:
            _build_attempted = True
            _build()
        if not os.path.exists(_SO_PATH):
            return None
        lib = ctypes.CDLL(_SO_PATH)
        lib.pawsio_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(_PawsInfo)]
        lib.pawsio_probe.restype = ctypes.c_int
        lib.pawsio_open.argtypes = [
            ctypes.c_char_p,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(_PawsInfo),
        ]
        lib.pawsio_open.restype = ctypes.c_void_p
        # stale prebuilt .so may predate the newer entry points — one try per
        # symbol, because a single shared block would skip the restype
        # declarations of LATER symbols that ARE present (their int64 returns
        # would then be silently truncated through the default c_int)
        _optional = [
            ("pawsio_open2",
             [ctypes.c_char_p, ctypes.c_double, ctypes.c_double, ctypes.c_double,
              ctypes.c_int, ctypes.POINTER(_PawsInfo)],
             ctypes.c_void_p),
            ("pawsio_open_span",
             [ctypes.c_char_p, ctypes.c_double, ctypes.c_double, ctypes.c_double,
              ctypes.c_longlong, ctypes.c_int, ctypes.POINTER(_PawsInfo)],
             ctypes.c_void_p),
            ("pawsio_open_span2",
             [ctypes.c_char_p, ctypes.c_double, ctypes.c_double, ctypes.c_double,
              ctypes.c_longlong, ctypes.c_int, ctypes.c_double,
              ctypes.POINTER(_PawsInfo)],
             ctypes.c_void_p),
            ("pawsio_keyframes",
             [ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_longlong],
             ctypes.c_longlong),
            ("pawsio_last_pts", [ctypes.c_void_p], ctypes.c_longlong),
            ("pawsio_last_slot", [ctypes.c_void_p], ctypes.c_longlong),
            # packets never decoded thanks to the fps-downsampling skip
            ("pawsio_skipped_packets", [ctypes.c_void_p], ctypes.c_longlong),
            # per-frame-origin ROI reads (speculative pipeline: each frame
            # cropped at its own predicted position)
            ("pawsio_read_roi_batch2",
             [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
              ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
              ctypes.c_uint8, ctypes.c_int],
             ctypes.c_int),
            ("pawsio_recrop2",
             [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
              ctypes.c_int, ctypes.c_int, ctypes.c_int,
              ctypes.POINTER(ctypes.c_int64), ctypes.c_uint8],
             ctypes.c_int),
            # process-global fast-decode override (-1 env / 0 off / 1 on) —
            # the stale-.so fallback for the fast_decode kwarg (see open3)
            ("pawsio_set_fast_decode", [ctypes.c_int], None),
            # latency-tuned encoder for the diagnostic overlay writer
            ("pawsio_enc_open_fast",
             [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double],
             ctypes.c_void_p),
            # zero-copy view of a retained ring frame (diagnostic overlay
            # downscales straight out of the decode ring)
            ("pawsio_retained_ptr",
             [ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)],
             ctypes.c_void_p),
            # superset open: slot0 + threads + seek hint + per-open fast
            # request in one signature — no global state, no open lock
            ("pawsio_open3",
             [ctypes.c_char_p, ctypes.c_double, ctypes.c_double, ctypes.c_double,
              ctypes.c_longlong, ctypes.c_int, ctypes.c_double, ctypes.c_int,
              ctypes.POINTER(_PawsInfo)],
             ctypes.c_void_p),
        ]
        for _name, _args, _res in _optional:
            try:
                fn = getattr(lib, _name)
            except AttributeError:
                continue
            fn.argtypes = _args
            fn.restype = _res
        lib.pawsio_read.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
        lib.pawsio_read.restype = ctypes.c_int
        lib.pawsio_read_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.pawsio_read_batch.restype = ctypes.c_int
        lib.pawsio_start_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.pawsio_start_prefetch.restype = ctypes.c_int
        lib.pawsio_read_roi_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_uint8,
        ]
        lib.pawsio_read_roi_batch.restype = ctypes.c_int
        lib.pawsio_read_roi_batch_retain.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_uint8,
            ctypes.c_int,
        ]
        lib.pawsio_read_roi_batch_retain.restype = ctypes.c_int
        lib.pawsio_recrop.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_uint8,
        ]
        lib.pawsio_recrop.restype = ctypes.c_int
        lib.pawsio_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.pawsio_release.restype = None
        lib.pawsio_advance_retain.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.pawsio_advance_retain.restype = ctypes.c_int
        lib.pawsio_close.argtypes = [ctypes.c_void_p]
        lib.pawsio_close.restype = None
        lib.pawsio_last_error.argtypes = []
        lib.pawsio_last_error.restype = ctypes.c_char_p
        lib.pawsio_enc_open.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double,
        ]
        lib.pawsio_enc_open.restype = ctypes.c_void_p
        lib.pawsio_enc_open_sar.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.pawsio_enc_open_sar.restype = ctypes.c_void_p
        lib.pawsio_enc_write.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
        lib.pawsio_enc_write.restype = ctypes.c_int
        lib.pawsio_enc_open_vfr.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.pawsio_enc_open_vfr.restype = ctypes.c_void_p
        lib.pawsio_enc_write_pts.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        lib.pawsio_enc_write_pts.restype = ctypes.c_int
        lib.pawsio_enc_close.argtypes = [ctypes.c_void_p]
        lib.pawsio_enc_close.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    """True when libpawsio.so is present (building it on first call if the
    toolchain allows)."""
    return _load() is not None


def _last_error(lib) -> str:
    try:
        return lib.pawsio_last_error().decode(errors="replace")
    except Exception:
        return "unknown native error"


def native_probe(path: str) -> VideoInfo:
    """Probe stream geometry/SAR/frame count via libavformat (the native
    analog of :func:`.decode.probe`)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native pawsio library unavailable")
    info = _PawsInfo()
    if lib.pawsio_probe(str(path).encode(), ctypes.byref(info)) != 0:
        raise IOError(f"could not open video: {path} ({_last_error(lib)})")
    sar = float(Fraction(info.sar_num, info.sar_den)) if info.sar_den else 1.0
    return VideoInfo(
        width=info.width,
        height=info.height,
        fps=info.fps,
        sar=sar,
        frame_count=max(int(info.nframes), 0),
    )


def native_keyframes(path: str, cap: int = 1 << 18) -> np.ndarray:
    """Demux-only keyframe index: presentation times (s) of key packets on
    the video stream. Empty array when the native layer (or entry point) is
    unavailable or on demux error — callers fall back to fixed spans."""
    lib = _load()
    if lib is None or not hasattr(lib, "pawsio_keyframes"):
        return np.empty(0)
    buf = (ctypes.c_double * cap)()
    n = lib.pawsio_keyframes(str(path).encode(), buf, cap)
    if n <= 0:
        return np.empty(0)
    return np.array(buf[: int(n)])


class NativeFrameSource:
    """Drop-in for OpenCVFrameSource backed by the C++ libav decoder.

    ``seek_hint`` (an exact demux seek target, passed by the keyframe-aligned
    parallel-decode planner) is only meaningful for mid-stream entry and is
    ignored when ``slot0 == 0`` — matching the pre-``pawsio_open3`` entry
    ladder, where only ``pawsio_open_span2`` (slot0 > 0) consumed it.
    """

    def __init__(
        self,
        path: str,
        *,
        start: float = 0.0,
        stop: float = math.inf,
        fps: float = 24.0,
        prefetch: int = 8,
        threads: int = -1,
        slot0: int = 0,
        seek_hint: float = -1.0,
        fast: bool | None = None,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native pawsio library unavailable")
        self._lib = lib
        self.path = str(path)
        self.start = float(start)
        self.stop = float(stop)
        self.fps = float(fps)
        # Python-side mirror of the C++ retained-window size — only read by
        # the per-frame-origin fallback for stale prebuilt libraries
        self._py_retained = 0
        info = _PawsInfo()
        if hasattr(lib, "pawsio_open3"):
            # preferred: the superset entry point carries the fast request
            # per-open — no process-global state, no lock, full open
            # concurrency for parallel-decode workers
            self._h = lib.pawsio_open3(
                self.path.encode(), self.start, self.stop, self.fps, int(slot0),
                int(threads), float(seek_hint) if slot0 > 0 else -1.0,
                -1 if fast is None else int(bool(fast)), ctypes.byref(info),
            )
            self._finish_open(lib, info, prefetch)
            return
        with _FastDecodeRequest(lib, fast):
            if slot0 > 0:
                if not hasattr(lib, "pawsio_open_span"):
                    raise RuntimeError("libpawsio.so predates pawsio_open_span — rebuild")
                # mid-stream entry on the GLOBAL slot grid (bit-exact with a
                # slot0=0 decoder's later slots; see parallel_decode.py).
                # seek_hint >= 0: exact demux seek target (the keyframe-aligned
                # planner passes the keyframe time itself)
                if seek_hint >= 0 and hasattr(lib, "pawsio_open_span2"):
                    self._h = lib.pawsio_open_span2(
                        self.path.encode(), self.start, self.stop, self.fps, int(slot0),
                        int(threads), float(seek_hint), ctypes.byref(info),
                    )
                else:
                    self._h = lib.pawsio_open_span(
                        self.path.encode(), self.start, self.stop, self.fps, int(slot0),
                        int(threads), ctypes.byref(info),
                    )
            elif threads >= 0 and hasattr(lib, "pawsio_open2"):
                self._h = lib.pawsio_open2(
                    self.path.encode(), self.start, self.stop, self.fps, int(threads),
                    ctypes.byref(info),
                )
            else:
                self._h = lib.pawsio_open(
                    self.path.encode(), self.start, self.stop, self.fps, ctypes.byref(info)
                )
        self._finish_open(lib, info, prefetch)

    def _finish_open(self, lib, info: _PawsInfo, prefetch: int):
        """Shared tail of ``__init__`` for the open3 and ladder open paths."""
        if not self._h:
            raise IOError(f"could not open video: {self.path} ({_last_error(lib)})")
        sar = float(Fraction(info.sar_num, info.sar_den)) if info.sar_den else 1.0
        self.info = VideoInfo(
            width=info.width,
            height=info.height,
            fps=info.fps,
            sar=sar,
            frame_count=max(int(info.nframes), 0),
        )
        #: decode-ahead ring capacity in frames (0 = ring-less synchronous
        #: decode); retained ROI reads need ring_frames >= retained + ahead
        self.ring_frames = int(prefetch)
        #: zero-copy retained-frame views available (fresh .so) — gates the
        #: diagnostics-on native fast path in the speculative pipeline
        self.can_view_retained = hasattr(lib, "pawsio_retained_ptr")
        if prefetch:
            lib.pawsio_start_prefetch(self._h, int(prefetch))

    def read(self) -> np.ndarray | None:
        out = np.empty((self.info.height, self.info.width), np.uint8)
        ret = self._lib.pawsio_read(self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if ret < 0:
            raise IOError(f"decode error: {_last_error(self._lib)}")
        return out if ret == 1 else None

    def read_chunk(self, n: int, out: np.ndarray | None = None) -> np.ndarray:
        """Read up to ``n`` frames. ``out`` (a ``[n, H, W] uint8`` buffer) is
        reused when given — avoids fresh page-faulting allocations per chunk."""
        if out is None or out.shape[0] < n:
            out = np.empty((n, self.info.height, self.info.width), np.uint8)
        got = self._lib.pawsio_read_batch(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), int(n)
        )
        if got < 0:
            raise IOError(f"decode error: {_last_error(self._lib)}")
        return out[:got]

    @staticmethod
    def _per_frame_origins(origin, n: int) -> np.ndarray | None:
        """``None`` for a single ``(r, c)`` origin; otherwise a C-contiguous
        int64 ``[n, 2]`` per-frame origin array (the speculative pipeline
        crops every frame at its own predicted position)."""
        if isinstance(origin, np.ndarray) and origin.ndim == 2:
            o = np.ascontiguousarray(origin[:n], np.int64)
            if o.shape != (n, 2):
                raise ValueError(f"per-frame origins must be [{n}, 2], got {origin.shape}")
            return o
        return None

    def read_roi_chunk(
        self, n: int, origin, ch: int, cw: int, fill: int, out: np.ndarray | None = None
    ) -> np.ndarray:
        """Read up to ``n`` frames as ``(ch, cw)`` crops at ``origin`` — one
        ``(r, c)`` pair, or per-frame ``[n, 2]`` origins (may be out of
        frame; out-of-frame cells get ``fill``). The crop is taken in C++
        directly from the decode ring, so full frames never cross into
        Python — the hot path of ROI streaming."""
        if out is None or out.shape[0] < n:
            out = np.empty((n, ch, cw), np.uint8)
        dst = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        os_ = self._per_frame_origins(origin, n)
        if os_ is None:
            got = self._lib.pawsio_read_roi_batch(
                self._h, dst, int(n), int(ch), int(cw),
                int(origin[0]), int(origin[1]), int(fill) & 0xFF,
            )
        elif hasattr(self._lib, "pawsio_read_roi_batch2"):
            got = self._lib.pawsio_read_roi_batch2(
                self._h, dst, int(n), int(ch), int(cw),
                os_.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                int(fill) & 0xFF, 0,
            )
        else:  # stale prebuilt .so: per-frame single-origin reads
            got = 0
            for i in range(n):
                r = self._lib.pawsio_read_roi_batch(
                    self._h,
                    out[i].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    1, int(ch), int(cw),
                    int(os_[i, 0]), int(os_[i, 1]), int(fill) & 0xFF,
                )
                if r < 0:
                    got = r
                    break
                if r == 0:
                    break
                got += 1
        if got < 0:
            raise IOError(f"decode error: {_last_error(self._lib)}")
        return out[:got]

    def read_roi_chunk_retained(
        self, n: int, origin, ch: int, cw: int, fill: int, out: np.ndarray | None = None
    ) -> np.ndarray:
        """Like :meth:`read_roi_chunk`, but the decoded frames stay RETAINED
        in the C++ ring until :meth:`release` — so a speculative pipeline can
        :meth:`recrop` them at a corrected origin on a mispredict without the
        full frames ever entering Python."""
        if out is None or out.shape[0] < n:
            out = np.empty((n, ch, cw), np.uint8)
        dst = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        os_ = self._per_frame_origins(origin, n)
        if os_ is None:
            got = self._lib.pawsio_read_roi_batch_retain(
                self._h, dst, int(n), int(ch), int(cw),
                int(origin[0]), int(origin[1]), int(fill) & 0xFF, 1,
            )
        elif hasattr(self._lib, "pawsio_read_roi_batch2"):
            got = self._lib.pawsio_read_roi_batch2(
                self._h, dst, int(n), int(ch), int(cw),
                os_.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                int(fill) & 0xFF, 1,
            )
        else:  # stale prebuilt .so: advance, then recrop each frame
            base = self._py_retained
            got = self.advance_retained(int(n))
            for i in range(got):
                self.recrop(base + i, 1, (int(os_[i, 0]), int(os_[i, 1])),
                            ch, cw, fill, out=out[i : i + 1])
        if got < 0:
            raise IOError(f"decode error: {_last_error(self._lib)}")
        self._py_retained += got
        return out[:got]

    def recrop(
        self, first: int, k: int, origin, ch: int, cw: int, fill: int, out: np.ndarray | None = None
    ) -> np.ndarray:
        """Crop retained frames ``[first, first+k)`` (0 = oldest retained) at
        a new origin — one ``(r, c)`` pair or per-frame ``[k, 2]``."""
        if out is None or out.shape[0] < k:
            out = np.empty((k, ch, cw), np.uint8)
        os_ = self._per_frame_origins(origin, k)
        if os_ is not None and hasattr(self._lib, "pawsio_recrop2"):
            got = self._lib.pawsio_recrop2(
                self._h,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                int(first), int(k), int(ch), int(cw),
                os_.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                int(fill) & 0xFF,
            )
        elif os_ is not None:  # stale prebuilt .so
            got = 0
            for i in range(k):
                r = self._lib.pawsio_recrop(
                    self._h,
                    out[i].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    int(first) + i, 1, int(ch), int(cw),
                    int(os_[i, 0]), int(os_[i, 1]), int(fill) & 0xFF,
                )
                if r < 0:
                    got = r
                    break
                got += r
        else:
            got = self._lib.pawsio_recrop(
                self._h,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                int(first), int(k), int(ch), int(cw),
                int(origin[0]), int(origin[1]), int(fill) & 0xFF,
            )
        if got < 0:
            raise IOError(f"recrop error: {_last_error(self._lib)}")
        return out[:got]

    @property
    def last_pts(self) -> int:
        """Shifted pts (stream ticks past ``start``) of the input frame
        behind the most recently read output; INT64_MIN before any read.
        Meaningful for synchronous (ring-less) sources — the parallel-decode
        span chain verifies boundary alignment with it."""
        if not hasattr(self._lib, "pawsio_last_pts"):
            return -(1 << 63)
        return int(self._lib.pawsio_last_pts(self._h))

    @property
    def skipped_packets(self) -> int:
        """Packets never sent to the decoder by the fps-downsampling skip
        (drop-fated non-reference frames on CFR h264 content; 0 when the
        optimization is inactive or on a stale .so)."""
        if not hasattr(self._lib, "pawsio_skipped_packets"):
            return 0
        return int(self._lib.pawsio_skipped_packets(self._h))

    @property
    def last_slot(self) -> int:
        """Global output slot of the most recently read frame; INT64_MIN
        before any read. Synchronous (ring-less) sources only."""
        if not hasattr(self._lib, "pawsio_last_slot"):
            return -(1 << 63)
        return int(self._lib.pawsio_last_slot(self._h))

    def advance_retained(self, n: int) -> int:
        """Decode up to ``n`` frames into the retained window WITHOUT
        cropping (use :meth:`recrop` per target). Returns the count."""
        got = self._lib.pawsio_advance_retain(self._h, int(n))
        if got < 0:
            raise IOError(f"decode error: {_last_error(self._lib)}")
        self._py_retained += got
        return got

    def retained_frame(self, idx: int) -> np.ndarray:
        """Zero-copy ``[H, W] uint8`` view of retained frame ``idx`` (0 =
        oldest). The view aliases the decode ring and is valid ONLY until
        that frame is :meth:`release`\\ d — consume it immediately (the
        diagnostic overlay writer resizes straight out of the ring; full
        frames never cross into Python)."""
        stride = ctypes.c_int()
        ptr = self._lib.pawsio_retained_ptr(self._h, int(idx), ctypes.byref(stride))
        if not ptr:
            raise IOError(f"retained_frame: {_last_error(self._lib)}")
        h, w = self.info.height, self.info.width
        n = stride.value * (h - 1) + w
        buf = (ctypes.c_uint8 * n).from_address(ptr)
        a = np.frombuffer(buf, np.uint8)
        return np.lib.stride_tricks.as_strided(a, shape=(h, w), strides=(stride.value, 1))

    def release(self, n: int):
        """Free the ``n`` oldest retained frames (the ring can refill them)."""
        self._lib.pawsio_release(self._h, int(n))
        self._py_retained = max(self._py_retained - int(n), 0)

    def close(self):
        if self._h:
            self._lib.pawsio_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeVFRWriter:
    """GRAY8 -> H.264 encoder with EXPLICIT per-frame timestamps (variable
    frame rate). Time base is 1/90000 s (the MPEG transport convention). Used
    to synthesize VFR fixtures for PTS-true decode tests."""

    TIMEBASE = 90000

    def __init__(self, path: str, width: int, height: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native pawsio library unavailable")
        self._lib = lib
        self.width = int(width)
        self.height = int(height)
        self._h = lib.pawsio_enc_open_vfr(
            str(path).encode(), self.width, self.height, 1, self.TIMEBASE
        )
        if not self._h:
            raise IOError(f"could not open VFR encoder for {path} ({_last_error(lib)})")

    def write(self, gray: np.ndarray, t_seconds: float):
        """Append a frame displayed at ``t_seconds``."""
        gray = np.ascontiguousarray(gray, np.uint8)
        assert gray.shape == (self.height, self.width)
        pts = int(round(float(t_seconds) * self.TIMEBASE))
        if self._lib.pawsio_enc_write_pts(
            self._h, gray.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), pts
        ) != 0:
            raise IOError(f"encode error: {_last_error(self._lib)}")

    def release(self):
        if self._h:
            self._lib.pawsio_enc_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.release()
        except Exception:
            pass


class NativeVideoWriter:
    """GRAY8 -> H.264 (libx264) encoder for the diagnostic stream.

    ``fast=True`` (fresh .so) uses the latency-tuned encoder (x264 ultrafast
    + zerolatency) — for writers on the tracking critical path, where encode
    time competes with decode for the same core. Default writers keep
    veryfast for record-comparable fixture synthesis.
    """

    def __init__(self, path: str, width: int, height: int, fps: float, sar=(1, 1),
                 fast: bool = False):
        lib = _load()
        if lib is None:
            raise RuntimeError("native pawsio library unavailable")
        self._lib = lib
        self.width = int(width)
        self.height = int(height)
        if fast and sar == (1, 1) and hasattr(lib, "pawsio_enc_open_fast"):
            self._h = lib.pawsio_enc_open_fast(
                str(path).encode(), self.width, self.height, float(fps)
            )
        else:
            self._h = lib.pawsio_enc_open_sar(
                str(path).encode(), self.width, self.height, float(fps),
                int(sar[0]), int(sar[1])
            )
        if not self._h:
            raise IOError(f"could not open encoder for {path} ({_last_error(lib)})")

    def write(self, gray: np.ndarray):
        gray = np.ascontiguousarray(gray, np.uint8)
        assert gray.shape == (self.height, self.width)
        if self._lib.pawsio_enc_write(
            self._h, gray.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        ) != 0:
            raise IOError(f"encode error: {_last_error(self._lib)}")

    def release(self):
        if self._h:
            self._lib.pawsio_enc_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.release()
        except Exception:
            pass
