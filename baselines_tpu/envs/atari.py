"""DeepMind Atari preprocessing — parity with
baselines/common/atari_wrappers.py, built on gymnasium + ale_py.

Chain (make_atari + wrap_deepmind, atari_wrappers.py:266-289):
NoopResetEnv(30) (:12-39) → MaxAndSkipEnv(4) (:97-123) → EpisodicLifeEnv
(:61-95) → FireResetEnv (:41-59) → WarpFrame 84×84 grayscale (:134-185) →
ClipRewardEnv sign (:125-131); frame stacking happens on device via
VecFrameStack (envs/vec.py) so HBM holds uint8 single frames — the LazyFrames
memory trick (:219-264) is unnecessary when the stack lives on device.

Requires ale_py (not present in every image); import is deferred so the rest
of the framework works without it.
"""

from __future__ import annotations

import numpy as np


def _gym():
    import gymnasium as gym

    return gym


class NoopResetEnv:
    """atari_wrappers.py:12-39."""

    def __init__(self, env, noop_max=30):
        self.env = env
        self.noop_max = noop_max
        self.noop_action = 0
        assert env.unwrapped.get_action_meanings()[0] == "NOOP"

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        noops = self.env.unwrapped.np_random.integers(1, self.noop_max + 1)
        for _ in range(noops):
            obs, _, terminated, truncated, info = self.env.step(self.noop_action)
            if terminated or truncated:
                obs, info = self.env.reset(**kwargs)
        return obs, info

    def step(self, action):
        return self.env.step(action)


class FireResetEnv:
    """atari_wrappers.py:41-59."""

    def __init__(self, env):
        self.env = env
        assert env.unwrapped.get_action_meanings()[1] == "FIRE"
        assert len(env.unwrapped.get_action_meanings()) >= 3

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        self.env.reset(**kwargs)
        obs, _, terminated, truncated, _ = self.env.step(1)
        if terminated or truncated:
            self.env.reset(**kwargs)
        obs, _, terminated, truncated, info = self.env.step(2)
        if terminated or truncated:
            obs, info = self.env.reset(**kwargs)
        return obs, info

    def step(self, action):
        return self.env.step(action)


class EpisodicLifeEnv:
    """atari_wrappers.py:61-95: end episode on life loss, reset only on true
    game over."""

    def __init__(self, env):
        self.env = env
        self.lives = 0
        self.was_real_done = True

    def __getattr__(self, name):
        return getattr(self.env, name)

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        self.was_real_done = terminated or truncated
        lives = self.env.unwrapped.ale.lives()
        if 0 < lives < self.lives:
            terminated = True
        self.lives = lives
        return obs, reward, terminated, truncated, info

    def reset(self, **kwargs):
        if self.was_real_done:
            obs, info = self.env.reset(**kwargs)
        else:
            obs, _, terminated, truncated, info = self.env.step(0)
            if terminated or truncated:
                obs, info = self.env.reset(**kwargs)
        self.lives = self.env.unwrapped.ale.lives()
        return obs, info


class MaxAndSkipEnv:
    """atari_wrappers.py:97-123: skip 4, max over the last two frames."""

    def __init__(self, env, skip=4):
        self.env = env
        self._skip = skip
        shp = env.observation_space.shape
        self._obs_buffer = np.zeros((2,) + shp, dtype=np.uint8)

    def __getattr__(self, name):
        return getattr(self.env, name)

    def step(self, action):
        total_reward = 0.0
        terminated = truncated = False
        info = {}
        for i in range(self._skip):
            obs, reward, terminated, truncated, info = self.env.step(action)
            if i == self._skip - 2:
                self._obs_buffer[0] = obs
            if i == self._skip - 1:
                self._obs_buffer[1] = obs
            total_reward += float(reward)
            if terminated or truncated:
                break
        max_frame = self._obs_buffer.max(axis=0)
        return max_frame, total_reward, terminated, truncated, info

    def reset(self, **kwargs):
        return self.env.reset(**kwargs)


class WarpFrame:
    """atari_wrappers.py:134-185: 84×84 grayscale."""

    def __init__(self, env, width=84, height=84):
        import cv2  # noqa: F401

        self.env = env
        self._width = width
        self._height = height
        gym = _gym()
        self.observation_space = gym.spaces.Box(
            low=0, high=255, shape=(height, width, 1), dtype=np.uint8
        )

    def __getattr__(self, name):
        return getattr(self.env, name)

    def _warp(self, frame):
        import cv2

        frame = cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY)
        frame = cv2.resize(
            frame, (self._width, self._height), interpolation=cv2.INTER_AREA
        )
        return frame[:, :, None]

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        return self._warp(obs), info

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        return self._warp(obs), reward, terminated, truncated, info


class ClipRewardEnv:
    """atari_wrappers.py:125-131: sign(reward)."""

    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        return self.env.reset(**kwargs)

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        return obs, float(np.sign(reward)), terminated, truncated, info


def make_atari(env_id: str, max_episode_steps=None, need_render: bool = False):
    """make_atari (atari_wrappers.py:266-273).  ``need_render`` requests an
    rgb_array render surface for VecVideoRecorder (--save_video_interval)."""
    gym = _gym()
    import ale_py  # noqa: F401  (registers ALE envs)

    env = gym.make(
        env_id, frameskip=1, repeat_action_probability=0.0,
        render_mode="rgb_array" if need_render else None,
    )
    env = NoopResetEnv(env, noop_max=30)
    env = MaxAndSkipEnv(env, skip=4)
    if max_episode_steps is not None:
        env = gym.wrappers.TimeLimit(env, max_episode_steps=max_episode_steps)
    return env


def wrap_deepmind(env, episode_life=True, clip_rewards=True, fire_reset=True):
    """wrap_deepmind (atari_wrappers.py:275-289); frame stacking and /255
    scaling live on device."""
    if episode_life:
        env = EpisodicLifeEnv(env)
    if fire_reset and "FIRE" in env.unwrapped.get_action_meanings():
        env = FireResetEnv(env)
    env = WarpFrame(env)
    if clip_rewards:
        env = ClipRewardEnv(env)
    return env


def make_atari_vec_env(env_id: str, num_envs: int, frame_stack: int = 4,
                       need_render: bool = False):
    """Full pipeline: subproc workers running the DeepMind chain feeding the
    device engine via io_callback, frame-stacked in HBM."""
    from baselines_tpu.envs.callback_env import CallbackVecEnv
    from baselines_tpu.envs.gym_bridge import HostSubprocVecEnv, HostDummyVecEnv
    from baselines_tpu.envs.vec import VecFrameStack

    def thunk():
        return wrap_deepmind(make_atari(env_id, need_render=need_render))

    host = (
        HostSubprocVecEnv([thunk] * num_envs)
        if num_envs > 1
        else HostDummyVecEnv([thunk])
    )
    venv = CallbackVecEnv(host)
    return VecFrameStack(venv, frame_stack)
