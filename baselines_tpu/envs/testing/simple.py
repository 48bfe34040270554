"""A deterministic obs-sequence env for engine-equivalence tests
(the role of SimpleEnv in baselines/common/vec_env/test_vec_env.py:110+).
obs[t] = f(seed_offset, t); reward = t; episodes of fixed length."""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from baselines_tpu.envs.base import JaxEnv
from baselines_tpu.envs.spaces import Box


@struct.dataclass
class SimpleState:
    t: jnp.ndarray


class SimpleDeterministicEnv(JaxEnv):
    def __init__(self, offset: float = 0.0, episode_len: int = 10, obs_dim: int = 3):
        self.offset = float(offset)
        self.episode_len = int(episode_len)
        self.obs_dim = obs_dim
        self.observation_space = Box(-1e9, 1e9, (obs_dim,))
        self.action_space = Box(-1.0, 1.0, (obs_dim,))

    def _obs(self, t):
        base = jnp.arange(self.obs_dim, dtype=jnp.float32)
        return base + self.offset + jnp.asarray(t, jnp.float32) * 100.0

    def reset(self, key):
        return self._obs(0), SimpleState(jnp.zeros((), jnp.int32))

    def step(self, key, state, action):
        t = state.t + 1
        done = t >= self.episode_len
        reward = jnp.asarray(state.t, jnp.float32)
        return self._obs(t), SimpleState(t), reward, done, {}
