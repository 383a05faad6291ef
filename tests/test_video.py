"""Rendering + video recording (reference: misc/rollout_utils.py:70-81)."""

import os

import jax
import numpy as np

from icem_tpu.envs import env_from_string
from icem_tpu.runtime.rollout import RolloutManager
from icem_tpu.runtime.seeding import Seeding
from icem_tpu.runtime.video import VideoRecorder


def test_planar_render_frame_shape():
    env = env_from_string("HalfCheetah",
                          exclude_current_positions_from_observation=False)
    state, _ = env.reset_with_mode(jax.random.key(0), "train")
    frame = env.render_frame(state)
    assert frame.dtype == np.uint8
    assert frame.ndim == 3 and frame.shape[2] == 3
    assert frame.shape[0] >= 200 and frame.shape[1] >= 300
    # something must be drawn (not a blank canvas)
    assert frame.std() > 1.0


def test_video_recorder_writes_gif(tmp_path):
    rec = VideoRecorder(str(tmp_path), "ep0", fps=20)
    for i in range(5):
        rec.append(np.full((32, 32, 3), i * 40, np.uint8))
    path = rec.close()
    assert path and os.path.getsize(path) > 0
    assert os.path.exists(os.path.join(str(tmp_path), "live_frame.png"))


def test_video_recorder_writes_mjpeg_avi(tmp_path):
    """The reference's movie artifact is MJPEG (rollout_utils.py:70-81);
    parse the RIFF container back and verify structure + JPEG payloads."""
    import struct

    rec = VideoRecorder(str(tmp_path), "ep0", fps=20)
    rng = np.random.default_rng(0)
    for i in range(7):
        rec.append(rng.integers(0, 255, (48, 64, 3)).astype(np.uint8))
    rec.close()
    path = os.path.join(str(tmp_path), "ep0.avi")
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    # avih: total frames at offset 16 into the avih payload
    avih_at = data.index(b"avih") + 8
    n_frames = struct.unpack("<I", data[avih_at + 16:avih_at + 20])[0]
    assert n_frames == 7
    assert b"vids" in data and b"MJPG" in data
    # walk the movi chunks: each 00dc payload must be a JPEG (SOI..EOI)
    movi_at = data.index(b"movi")
    at = movi_at + 4
    count = 0
    while data[at:at + 4] == b"00dc":
        size = struct.unpack("<I", data[at + 4:at + 8])[0]
        jpeg = data[at + 8:at + 8 + size]
        assert jpeg[:2] == b"\xff\xd8" and jpeg[-2:] == b"\xff\xd9"
        from PIL import Image
        import io
        img = Image.open(io.BytesIO(jpeg))
        assert img.size == (64, 48)
        at += 8 + size + (size % 2)
        count += 1
    assert count == 7
    # idx1 exists and indexes all frames
    idx_at = data.index(b"idx1")
    idx_size = struct.unpack("<I", data[idx_at + 4:idx_at + 8])[0]
    assert idx_size == 7 * 16


def test_rollout_manager_records_episode(tmp_path):
    Seeding.set_seed(0)
    env = env_from_string("Hopper",
                          exclude_current_positions_from_observation=False)

    class ZeroPolicy:
        def get_action(self, obs, state=None, mode="train"):
            return np.zeros(3, np.float32)

    man = RolloutManager(env, dict(task_horizon=5, record=str(tmp_path / "vids")))
    rollouts = man.sample(ZeroPolicy(), mode="train", name="train", no_rollouts=1)
    assert len(rollouts) == 1
    gifs = [f for f in os.listdir(tmp_path / "vids") if f.endswith(".gif")]
    assert len(gifs) == 1
