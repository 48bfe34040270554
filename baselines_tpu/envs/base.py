"""The pure-functional environment interface.

This replaces the reference's VecEnv process machinery
(baselines/common/vec_env/: DummyVecEnv, SubprocVecEnv, ShmemVecEnv) for
environments whose dynamics can live on device: an env is a pair of pure
functions over an explicit state pytree, so N copies are a ``jax.vmap`` and a
T-step rollout is a ``jax.lax.scan`` — the whole data plane compiles into the
training step instead of crossing process pipes every step
(subproc_vec_env.py:75-88).

Contract:
    obs, state = env.reset(key)
    obs, state, reward, done, info = env.step(key, state, action)

- `state` is an arbitrary pytree (static structure, static shapes).
- `done` is the combined terminated-or-truncated flag, matching the
  reference's gym-0.x semantics where TimeLimit truncation also returns
  done=True with info['TimeLimit.truncated'] (common/wrappers.py:3-19).
- `info` is a dict of arrays with static keys; time-limit truncation is
  surfaced as info['truncated'].
- Episode auto-reset is NOT done here; the vector layer does it
  (envs/vec.py), matching subprocess worker semantics
  (subproc_vec_env.py:8-12: obs after done is the reset obs).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from baselines_tpu.envs.spaces import Space

EnvState = Any
Obs = Any


class JaxEnv:
    observation_space: Space
    action_space: Space

    def reset(self, key) -> Tuple[Obs, EnvState]:
        raise NotImplementedError

    def step(self, key, state: EnvState, action) -> Tuple[Obs, EnvState, jnp.ndarray, jnp.ndarray, Dict]:
        raise NotImplementedError

    @property
    def unwrapped(self) -> "JaxEnv":
        return self

    def render_frame(self, state):
        """Optional: return an HWC uint8 image for video capture."""
        raise NotImplementedError(f"{type(self).__name__} does not support rendering")


class EnvWrapper(JaxEnv):
    def __init__(self, env: JaxEnv):
        self.env = env
        self.observation_space = env.observation_space
        self.action_space = env.action_space

    def reset(self, key):
        return self.env.reset(key)

    def step(self, key, state, action):
        return self.env.step(key, state, action)

    @property
    def unwrapped(self):
        return self.env.unwrapped


class TimeLimit(EnvWrapper):
    """Truncate episodes at max_episode_steps, reporting info['truncated']
    (common/wrappers.py:3-19 parity).  State becomes (inner_state, t)."""

    def __init__(self, env: JaxEnv, max_episode_steps: int):
        super().__init__(env)
        self.max_episode_steps = int(max_episode_steps)

    def reset(self, key):
        obs, state = self.env.reset(key)
        return obs, (state, jnp.zeros((), jnp.int32))

    def step(self, key, state, action):
        inner, t = state
        obs, inner, reward, done, info = self.env.step(key, inner, action)
        t = t + 1
        truncated = (t >= self.max_episode_steps) & (~done)
        info = dict(info)
        info["truncated"] = truncated
        return obs, (inner, t), reward, done | truncated, info


class ClipActions(EnvWrapper):
    """nan_to_num + clip actions to the Box bounds
    (common/wrappers.py:21-29 parity)."""

    def step(self, key, state, action):
        low = jnp.asarray(self.action_space.low)
        high = jnp.asarray(self.action_space.high)
        action = jnp.clip(jnp.nan_to_num(action), low, high)
        return self.env.step(key, state, action)


class RewardScale(EnvWrapper):
    """reward *= scale — the --reward_scale flag / retro RewardScaler
    (common/retro_wrappers.py, cmd_util make_vec_env reward_scale arg)."""

    def __init__(self, env: JaxEnv, scale: float):
        super().__init__(env)
        self.scale = float(scale)

    def step(self, key, state, action):
        obs, state, reward, done, info = self.env.step(key, state, action)
        return obs, state, reward * self.scale, done, info


class ClipReward(EnvWrapper):
    """Sign-clip rewards, the DeepMind Atari ClipRewardEnv
    (common/atari_wrappers.py:125-131)."""

    def step(self, key, state, action):
        obs, state, reward, done, info = self.env.step(key, state, action)
        return obs, state, jnp.sign(reward), done, info
