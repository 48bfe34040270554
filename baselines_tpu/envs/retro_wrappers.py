"""Retro (Sega/SNES) wrappers — parity with baselines/common/retro_wrappers.py.

The `retro` emulator package is optional (not present in every image), so
everything importing it is deferred; the generic wrappers
(StochasticFrameSkip :10-50, Downsample, Rgb2gray, RewardScaler,
TimeLimit-by-steps) work on any gymnasium env.
"""

from __future__ import annotations

import numpy as np


class StochasticFrameSkip:
    """retro_wrappers.py:10-50: repeat the previous action with prob
    stickprob at each sub-step of an n-frame skip."""

    def __init__(self, env, n, stickprob, seed=None):
        self.env = env
        self.n = n
        self.stickprob = stickprob
        self.curac = None
        self.rng = np.random.RandomState(seed)

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        self.curac = None
        return self.env.reset(**kwargs)

    def step(self, ac):
        terminated = truncated = False
        totrew = 0
        info = {}
        obs = None
        for i in range(self.n):
            # first substep: maybe keep the previous action
            if self.curac is None:
                self.curac = ac
            elif i == 0:
                if self.rng.rand() > self.stickprob:
                    self.curac = ac
            elif i == 1:
                self.curac = ac
            obs, rew, terminated, truncated, info = self.env.step(self.curac)
            totrew += rew
            if terminated or truncated:
                break
        return obs, totrew, terminated, truncated, info


class Downsample:
    """retro_wrappers.py: downsample observation by an integer ratio."""

    def __init__(self, env, ratio):
        self.env = env
        self.ratio = ratio

    def __getattr__(self, name):
        return getattr(self.env, name)

    def _ds(self, frame):
        return frame[:: self.ratio, :: self.ratio]

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        return self._ds(obs), info

    def step(self, action):
        obs, rew, term, trunc, info = self.env.step(action)
        return self._ds(obs), rew, term, trunc, info


class Rgb2gray:
    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    @staticmethod
    def _gray(frame):
        return np.mean(frame, axis=-1, keepdims=True).astype(np.uint8)

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        return self._gray(obs), info

    def step(self, action):
        obs, rew, term, trunc, info = self.env.step(action)
        return self._gray(obs), rew, term, trunc, info


class RewardScaler:
    """retro_wrappers.py RewardScaler — PPO-scale reward shaping."""

    def __init__(self, env, scale=0.01):
        self.env = env
        self.scale = scale

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        return self.env.reset(**kwargs)

    def step(self, action):
        obs, rew, term, trunc, info = self.env.step(action)
        return obs, rew * self.scale, term, trunc, info


def make_retro(*, game, state=None, max_episode_steps=4500, **kwargs):
    """retro_wrappers.make_retro parity; requires the `retro` package."""
    import retro

    if state is None:
        state = retro.State.DEFAULT
    env = retro.make(game, state, **kwargs)
    env = StochasticFrameSkip(env, n=4, stickprob=0.25)
    if max_episode_steps is not None:
        import gymnasium as gym

        env = gym.wrappers.TimeLimit(env, max_episode_steps=max_episode_steps)
    return env


def make_retro_vec_env(env_id: str, num_envs: int, gamestate=None, frame_stack: int = 4):
    """Retro pipeline behind the io_callback bridge — the --gamestate CLI
    surface (ref run.py:99-101: retro envs get gamestate + retro wrapper
    chain).  Requires the `retro` package."""
    from baselines_tpu.envs.callback_env import CallbackVecEnv
    from baselines_tpu.envs.gym_bridge import HostDummyVecEnv, HostSubprocVecEnv
    from baselines_tpu.envs.vec import VecFrameStack

    def thunk():
        return wrap_deepmind_retro(make_retro(game=env_id, state=gamestate))

    host = (
        HostSubprocVecEnv([thunk] * num_envs)
        if num_envs > 1
        else HostDummyVecEnv([thunk])
    )
    venv = CallbackVecEnv(host)
    return VecFrameStack(venv, frame_stack) if frame_stack > 1 else venv


def wrap_deepmind_retro(env, scale=True, frame_stack=4):
    """retro_wrappers.wrap_deepmind_retro parity: warp + reward scale;
    frame stacking happens on device (VecFrameStack)."""
    from baselines_tpu.envs.atari import WarpFrame, ClipRewardEnv

    env = WarpFrame(env)
    env = ClipRewardEnv(env)
    return env
