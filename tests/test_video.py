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
