"""Identity fixture environments — the reference's key testing trick
(baselines/common/tests/envs/identity_env.py:7-90): the observation IS the
correct action, so any algorithm that can learn at all solves them in a few
thousand steps, deterministically and without a simulator.

Pure-JAX versions so learning tests run fully jitted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from baselines_tpu.envs.base import JaxEnv
from baselines_tpu.envs.spaces import Box, Discrete, MultiDiscrete


@struct.dataclass
class IdentityState:
    target: jnp.ndarray
    t: jnp.ndarray


class _IdentityBase(JaxEnv):
    def __init__(self, episode_len: int = 100):
        self.episode_len = int(episode_len)

    def _sample_target(self, key):
        raise NotImplementedError

    def _reward(self, target, action):
        raise NotImplementedError

    def _obs(self, target):
        return target

    def reset(self, key):
        target = self._sample_target(key)
        state = IdentityState(target, jnp.zeros((), jnp.int32))
        return self._obs(target), state

    def step(self, key, state, action):
        reward = self._reward(state.target, action)
        new_target = self._sample_target(key)
        t = state.t + 1
        done = t >= self.episode_len
        new_state = IdentityState(new_target, t)
        return self._obs(new_target), new_state, reward, done, {}


class DiscreteIdentityEnv(_IdentityBase):
    """obs in {0..dim-1}; reward 1 iff action == obs
    (identity_env.py DiscreteIdentityEnv)."""

    def __init__(self, dim: int, episode_len: int = 100):
        super().__init__(episode_len)
        self.dim = dim
        self.observation_space = Discrete(dim)
        self.action_space = Discrete(dim)

    def _sample_target(self, key):
        return jax.random.randint(key, (), 0, self.dim, dtype=jnp.int32)

    def _reward(self, target, action):
        return (action == target).astype(jnp.float32)


class MultiDiscreteIdentityEnv(_IdentityBase):
    def __init__(self, dims, episode_len: int = 100):
        super().__init__(episode_len)
        self.dims = np.asarray(dims, np.int32)
        self.observation_space = MultiDiscrete(self.dims)
        self.action_space = MultiDiscrete(self.dims)

    def _sample_target(self, key):
        u = jax.random.uniform(key, self.dims.shape)
        return jnp.floor(u * jnp.asarray(self.dims)).astype(jnp.int32)

    def _reward(self, target, action):
        return jnp.all(action == target).astype(jnp.float32)


class ImageIdentityEnv(_IdentityBase):
    """Discrete identity with image observations — the target class is drawn
    as a bright vertical stripe in a (size, size, 1) frame.  Fills the role
    of the reference's MnistEnv (common/tests/envs/mnist_env.py:10-71):
    classification-as-RL for exercising CNN policies without a dataset.
    """

    def __init__(self, dim: int = 4, size: int = 24, episode_len: int = 100):
        super().__init__(episode_len)
        self.dim = dim
        self.size = size
        self.observation_space = Box(0.0, 1.0, (size, size, 1))
        self.action_space = Discrete(dim)

    def _sample_target(self, key):
        return jax.random.randint(key, (), 0, self.dim, dtype=jnp.int32)

    def _reward(self, target, action):
        return (action == target).astype(jnp.float32)

    def _obs(self, target):
        stripe = self.size // self.dim
        cols = jnp.arange(self.size)
        on = (cols >= target * stripe) & (cols < (target + 1) * stripe)
        frame = jnp.broadcast_to(on.astype(jnp.float32), (self.size, self.size))
        return frame[..., None]


class BoxIdentityEnv(_IdentityBase):
    """obs in [-1,1]^shape; reward = -||action - obs||^2
    (identity_env.py BoxIdentityEnv)."""

    def __init__(self, shape=(1,), episode_len: int = 100):
        super().__init__(episode_len)
        self.observation_space = Box(-1.0, 1.0, shape)
        self.action_space = Box(-1.0, 1.0, shape)

    def _sample_target(self, key):
        return jax.random.uniform(key, self.observation_space.shape, jnp.float32, -1.0, 1.0)

    def _reward(self, target, action):
        return -jnp.sum(jnp.square(action - target)).astype(jnp.float32)
