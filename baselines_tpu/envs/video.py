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
import jax.experimental
import jax.numpy as jnp
import numpy as np
from flax import struct

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


def unwrap_vec_state(state):
    """Peel vector-wrapper states (MonitorState/NormalizeState/... with an
    .inner field) down to the base vec-env state."""
    while hasattr(state, "inner"):
        state = state.inner
    return state


@struct.dataclass
class VideoState:
    inner: object
    t: jnp.ndarray  # global step counter, scalar int32


class VecVideoRecorder:
    """Trigger-based mp4 capture around the training env — the functional
    rebuild of vec_video_recorder.py:7-89 for the --save_video_interval /
    --save_video_length CLI surface (ref run.py:104-108, cmd_util.py:163-164).

    Wraps a functional vec env; each step fires one ordered io_callback that
    hands (global step, post-step env state) to a host-side recorder.  When
    `record_video_trigger(step)` fires, the next `video_length` frames are
    rendered through `frame_fn(state)` and written to
    <directory>/video.<alg-step>.mp4.  The callback cost is only paid when
    the wrapper is requested.
    """

    def __init__(self, venv, directory, record_video_trigger, video_length=200,
                 frame_fn=None, fps=30):
        self.venv = venv
        self.num_envs = venv.num_envs
        self.observation_space = venv.observation_space
        self.action_space = venv.action_space
        self.directory = osp.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.trigger = record_video_trigger
        self.video_length = int(video_length)
        self.frame_fn = frame_fn
        self.fps = fps
        self._rec = None
        self._frames_left = 0

    # -- host side ----------------------------------------------------------
    def _tick(self, t, state):
        t = int(t)
        if self._rec is None and self.trigger(t):
            path = osp.join(self.directory, f"video.{t:09d}.mp4")
            self._rec = VideoRecorder(path, fps=self.fps)
            self._frames_left = self.video_length
        if self._rec is not None:
            self._rec.append(self.frame_fn(state))
            self._frames_left -= 1
            if self._frames_left <= 0:
                self.close_recorder()
        return np.int32(0)

    def close_recorder(self):
        if self._rec is not None:
            self._rec.close()
            self._rec = None

    # -- functional interface -------------------------------------------------
    def reset(self, key):
        obs, inner = self.venv.reset(key)
        return obs, VideoState(inner, jnp.zeros((), jnp.int32))

    def step(self, key, state, actions):
        obs, inner, rew, done, info = self.venv.step(key, state.inner, actions)
        token = jax.experimental.io_callback(
            self._tick, jax.ShapeDtypeStruct((), jnp.int32), state.t, inner,
            ordered=True,
        )
        # fold the token into the carried counter so the callback cannot be
        # dead-code-eliminated
        return obs, VideoState(inner, state.t + 1 + token * 0), rew, done, info

    def close(self):
        self.close_recorder()
        close = getattr(self.venv, "close", None)
        if close is not None:
            close()


def jax_env_frame_fn(env, max_tiles: int = 4):
    """frame_fn for pure-JAX vector envs: render up to max_tiles envs from the
    batched base state and tile them into one image."""

    def fn(state):
        state = jax.device_get(unwrap_vec_state(state))
        base = state_inner(state)
        n = jax.tree_util.tree_leaves(base)[0].shape[0]
        frames = [
            env.unwrapped.render_frame(
                jax.tree_util.tree_map(lambda x: x[i], state_inner(state))
            )
            for i in range(min(n, max_tiles))
        ]
        return tile_images(frames)

    return fn
