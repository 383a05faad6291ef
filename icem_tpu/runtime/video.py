"""Episode video recording.

Reference behavior (icem/misc/rollout_utils.py:70-81, :174-183): an imageio
movie writer plus a live-updating still of the last frame. This image ships
no ffmpeg backend, so movies are written as GIF; the live still is a PNG
refreshed every ``live_every`` frames.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class VideoRecorder:
    """Accumulates frames for one episode and writes <name>.gif (+ live PNG)."""

    def __init__(self, directory: str, name: str, fps: float = 20.0,
                 live_frame: bool = True, live_every: int = 10):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, f"{name}.gif")
        self.live_path = os.path.join(directory, "live_frame.png")
        self.fps = float(fps)
        self.live_frame = bool(live_frame)
        self.live_every = int(live_every)
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
        # GIF frame delay: the v2 API interprets `duration` in SECONDS, the
        # v3 GIF plugin in MILLISECONDS — mixing them up plays GIFs ~1000x
        # too fast. Pin the v2 writer explicitly so semantics can't drift
        # with the installed imageio's default API.
        try:
            import imageio.v2 as imageio
        except ImportError:
            import imageio
        duration = max(1.0 / self.fps, 0.02)
        imageio.mimwrite(self.path, self._frames, duration=duration, loop=0)
        self._frames = []
        return self.path
