"""FixedSequenceEnv — memorize a fixed action sequence; the observation is
constant, so only a recurrent policy can solve it
(baselines/common/tests/envs/fixed_sequence_env.py:6-41 parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from baselines_tpu.envs.base import JaxEnv
from baselines_tpu.envs.spaces import Discrete


@struct.dataclass
class FixedSequenceState:
    t: jnp.ndarray


class FixedSequenceEnv(JaxEnv):
    def __init__(self, n_actions: int = 10, episode_len: int = 100, seed: int = 0):
        self.n_actions = n_actions
        self.episode_len = int(episode_len)
        rng = np.random.RandomState(seed)
        self.sequence = jnp.asarray(
            rng.randint(0, n_actions, size=episode_len), jnp.int32
        )
        self.observation_space = Discrete(1)
        self.action_space = Discrete(n_actions)

    def reset(self, key):
        return jnp.zeros((), jnp.int32), FixedSequenceState(jnp.zeros((), jnp.int32))

    def step(self, key, state, action):
        reward = (action == self.sequence[state.t]).astype(jnp.float32)
        t = state.t + 1
        done = t >= self.episode_len
        return jnp.zeros((), jnp.int32), FixedSequenceState(t), reward, done, {}
