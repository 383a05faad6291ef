"""Episode video recording.

Reference behavior (icem/misc/rollout_utils.py:70-81, :174-183): an MJPEG
movie writer (imageio/ffmpeg) plus a live-updating still of the last frame.
This image ships no ffmpeg backend, so the MJPEG movie is written by a
self-contained RIFF-AVI muxer (an MJPEG AVI is just JPEG frames in 00dc
chunks + an idx1 index; PIL does the JPEG encode) — same artifact class the
reference produces — alongside a GIF for inline viewing; the live still is
a PNG refreshed every ``live_every`` frames.
"""

from __future__ import annotations

import io
import os
import struct
from typing import Optional

import numpy as np


def write_mjpeg_avi(path: str, frames, fps: float = 20.0,
                    quality: int = 85) -> str:
    """Mux ``frames`` (HxWx3 uint8) into an MJPEG AVI at ``path``.

    Standard RIFF layout: hdrl(avih + strl(strh 'vids'/'MJPG' + strf
    BITMAPINFOHEADER)) + movi('00dc' JPEG chunks, even-padded) + idx1.
    Reference analog: the imageio mjpeg writer used by
    rollout_utils.py:70-81.
    """
    from PIL import Image

    h, w = np.asarray(frames[0]).shape[:2]
    jpegs = []
    for f in frames:
        buf = io.BytesIO()
        arr = np.asarray(f, np.uint8)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, -1)
        Image.fromarray(arr[..., :3]).save(buf, "JPEG", quality=quality)
        jpegs.append(buf.getvalue())

    n = len(jpegs)
    max_size = max(len(j) for j in jpegs)

    def chunk(fcc, payload):
        pad = b"\0" if len(payload) % 2 else b""
        return fcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc, payload):
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<14I", int(1e6 / fps), max_size * int(fps) + 1, 0, 0x10, n, 0, 1,
        max_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1,
                                            int(round(fps)), 0, n, max_size,
                                            -1, 0)
            + struct.pack("<4h", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = b""
    index = b""
    for j in jpegs:
        # idx1 offsets are measured from the 'movi' fourcc position
        index += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_payload),
                                       len(j))
        movi_payload += chunk(b"00dc", j)
    movi = lst(b"movi", movi_payload)
    idx1 = chunk(b"idx1", index)

    body = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    return path


class VideoRecorder:
    """Accumulates frames for one episode and writes <name>.gif (+ live PNG)."""

    def __init__(self, directory: str, name: str, fps: float = 20.0,
                 live_frame: bool = True, live_every: int = 10,
                 formats: tuple = ("avi", "gif")):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, f"{name}.gif")
        self.avi_path = os.path.join(directory, f"{name}.avi")
        self.live_path = os.path.join(directory, "live_frame.png")
        self.fps = float(fps)
        self.live_frame = bool(live_frame)
        self.live_every = int(live_every)
        self.formats = tuple(formats)
        self._frames = []

    def append(self, frame: np.ndarray):
        frame = np.asarray(frame, np.uint8)
        self._frames.append(frame)
        if self.live_frame and len(self._frames) % self.live_every == 1:
            self._write_live(frame)

    def _write_live(self, frame):
        try:
            import imageio
            imageio.imwrite(self.live_path, frame)
        except Exception:
            pass

    def close(self) -> Optional[str]:
        if not self._frames:
            return None
        if "avi" in self.formats:
            # the reference's movie artifact is MJPEG (rollout_utils.py:70-81)
            write_mjpeg_avi(self.avi_path, self._frames, fps=self.fps)
        if "gif" in self.formats:
            # GIF frame delay: the v2 API interprets `duration` in SECONDS,
            # the v3 GIF plugin in MILLISECONDS — mixing them up plays GIFs
            # ~1000x too fast. Pin the v2 writer explicitly so semantics
            # can't drift with the installed imageio's default API.
            try:
                import imageio.v2 as imageio
            except ImportError:
                import imageio
            duration = max(1.0 / self.fps, 0.02)
            imageio.mimwrite(self.path, self._frames, duration=duration,
                             loop=0)
        self._frames = []
        return self.path
