"""Diagnostic overlay video writer (host-side).

Analog of the reference's diagnose subsystem (reference: src/diagnose.jl:1-55):
a fixed 640x360 grayscale video with the clip label, a marker at the tracked
position, and a trail through the last 100 positions. Null-object (`Dont`) when
disabled; a context manager guarantees encoder finalization on error.

The label is rasterized with a BUNDLED TrueType face (assets/DejaVuSans.ttf,
free license alongside) via PIL/FreeType — the analog of the reference's
bundled ``TeXGyreHerosMakie-Regular.otf`` rendered through FreeTypeAbstraction
(reference: src/PawsomeTracker.jl:21-24, src/diagnose.jl:34): size 20 at
(20, 20), left/top aligned. The glyph bitmap is rendered ONCE per writer and
alpha-blended per frame. Falls back to OpenCV Hershey text when PIL is absent.
"""

from __future__ import annotations

import os
from collections import deque
from contextlib import contextmanager

import numpy as np

#: (rows, cols) of the diagnostic video (reference: src/diagnose.jl:2)
DIAGNOSTIC_VIDEO_SIZE = (360, 640)
#: trail length in positions (reference: src/diagnose.jl:3)
TRACE_BUFFER_SIZE = 100

__all__ = ["Diagnose", "Dont", "diagnose", "DIAGNOSTIC_VIDEO_SIZE", "TRACE_BUFFER_SIZE"]

_FOURCC_BY_EXT = {
    ".mp4": "mp4v",
    ".m4v": "mp4v",
    ".mov": "mp4v",
    ".avi": "MJPG",
    ".mkv": "mp4v",
    ".ts": "mp4v",
}


#: bundled FreeType face (reference: src/PawsomeTracker.jl:21-24)
FONT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets", "DejaVuSans.ttf")
#: label raster parameters (reference: src/diagnose.jl:34 — renderstring! at
#: pixelsize 20, position (20, 20), halign=:hleft, valign=:vtop)
LABEL_SIZE = 20
LABEL_POS = (20, 20)  # (row, col) of the label's top-left corner


def _render_label(label: str):
    """Rasterize ``label`` once to an 8-bit alpha bitmap with the bundled
    TrueType face; None when PIL/FreeType is unavailable (Hershey fallback)."""
    try:
        from PIL import Image, ImageDraw, ImageFont
    except Exception:
        return None
    try:
        font = ImageFont.truetype(FONT_PATH, LABEL_SIZE)
    except Exception:
        return None
    img = Image.new("L", (DIAGNOSTIC_VIDEO_SIZE[1], LABEL_SIZE * 2), 0)
    d = ImageDraw.Draw(img)
    d.text((0, 0), label, fill=255, font=font)
    a = np.asarray(img, np.uint8)
    rows = np.nonzero(a.any(axis=1))[0]
    cols = np.nonzero(a.any(axis=0))[0]
    if len(rows) == 0:
        return np.zeros((1, 1), np.float32)
    # keep the face's own top-side bearing (valign=:vtop anchors the em box)
    return a[: rows[-1] + 1, : cols[-1] + 1].astype(np.float32) / 255.0


def _open_writer(file: str, fps: float):
    h, w = DIAGNOSTIC_VIDEO_SIZE
    # prefer the native libx264 encoder (analog of the reference's libav
    # VideoWriter, reference: src/diagnose.jl:18); fall back to cv2
    try:
        from .io.native_io import NativeVideoWriter, native_available

        if native_available():
            # latency-tuned: overlay encode shares a core with decode on the
            # tracking critical path (ultrafast costs ~0.3 ms/frame at 360p
            # vs ~1.2 ms for veryfast, measured)
            return NativeVideoWriter(file, w, h, fps, fast=True)
    except Exception:
        pass
    import cv2

    ext = os.path.splitext(file)[1].lower()
    candidates = [_FOURCC_BY_EXT.get(ext, "mp4v"), "mp4v", "MJPG", "XVID"]
    for fourcc in candidates:
        vw = cv2.VideoWriter(file, cv2.VideoWriter_fourcc(*fourcc), fps, (w, h), isColor=False)
        if vw.isOpened():
            return vw
        vw.release()
    raise IOError(f"could not open diagnostic video writer for {file}")


class Diagnose:
    """Overlay writer. Label is the basename (sans extension) of the
    *diagnostic output file*, not the input video (reference: src/diagnose.jl:14);
    overlay color is white for darker targets, black otherwise (:17)."""

    def __init__(self, file: str, darker_target: bool, fps: float = 24.0):
        import cv2  # fail at construction, not after a whole track() of work

        self._cv2 = cv2
        self.file = str(file)
        self.label = os.path.splitext(os.path.basename(self.file))[0]
        self.color = 255 if darker_target else 0
        self.trace: deque = deque(maxlen=TRACE_BUFFER_SIZE)
        self._traces: list[deque] = [self.trace]  # grows for multi-target
        self.ratio: tuple[float, float] | None = None
        self._writer = _open_writer(self.file, fps)
        self._buffer = np.empty(DIAGNOSTIC_VIDEO_SIZE, np.uint8)
        self._label_alpha = _render_label(self.label)  # None -> Hershey fallback

    def update_ratio(self, frame_shape):
        """Set the full-frame -> diagnostic-buffer scale from frame 1
        (reference: src/diagnose.jl:26-28)."""
        self.ratio = (
            DIAGNOSTIC_VIDEO_SIZE[0] / frame_shape[0],
            DIAGNOSTIC_VIDEO_SIZE[1] / frame_shape[1],
        )

    def __call__(self, img: np.ndarray, point):
        """Write one overlay frame (reference: src/diagnose.jl:30-38).

        ``point`` is one (row, col) position, or an ``[N, 2]`` array for
        multi-target tracking (extension beyond the single-target reference:
        N markers, one trail per target; target 0's trail is ``self.trace``)."""
        cv2 = self._cv2

        if self.ratio is None:
            self.update_ratio(img.shape)
        pts = np.atleast_2d(np.asarray(point, np.float64))  # [N, 2]
        if len(self._traces) != len(pts):
            self._traces = [self.trace] + [
                deque(maxlen=TRACE_BUFFER_SIZE) for _ in range(len(pts) - 1)
            ]
        cv2.resize(img, (DIAGNOSTIC_VIDEO_SIZE[1], DIAGNOSTIC_VIDEO_SIZE[0]), dst=self._buffer)
        buf = self._buffer
        if self._label_alpha is not None:
            a = self._label_alpha
            r0, c0 = LABEL_POS
            h, w = a.shape
            region = buf[r0 : r0 + h, c0 : c0 + w]
            ar = a[: region.shape[0], : region.shape[1]]
            region[:] = (region * (1.0 - ar) + self.color * ar).astype(np.uint8)
        else:
            cv2.putText(buf, self.label, (20, 30), cv2.FONT_HERSHEY_SIMPLEX, 0.6, self.color, 1, cv2.LINE_AA)
        for trace, p in zip(self._traces, pts):
            ij = (
                int(np.rint(p[0] * self.ratio[0])),
                int(np.rint(p[1] * self.ratio[1])),
            )
            trace.append(ij)
            cv2.circle(buf, (ij[1], ij[0]), 2, self.color, -1)
            if len(trace) > 1:
                tp = np.array([(j, i) for i, j in trace], np.int32).reshape(-1, 1, 2)
                cv2.polylines(buf, [tp], False, self.color, 1)
        self._writer.write(buf)

    def close(self):
        self._writer.release()


class Dont:
    """Null-object: answers all Diagnose calls with None
    (reference: src/diagnose.jl:42-46)."""

    def update_ratio(self, frame_shape):
        return None

    def __call__(self, img, point):
        return None

    def close(self):
        return None


@contextmanager
def diagnose(file: str | None, darker_target: bool, fps: float = 24.0):
    """Context manager guaranteeing encoder finalization
    (reference: src/diagnose.jl:48-55)."""
    dia = Dont() if file is None else Diagnose(file, darker_target, fps)
    try:
        yield dia
    finally:
        dia.close()
