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


class ImageFixedSequenceEnv(FixedSequenceEnv):
    """FixedSequence with a constant uint8 image observation — exercises the
    cnn_lstm / cnn_lnlstm networks end to end (the CNN sees a fixed nonzero
    pattern so conv weights receive gradient; the memorization signal still
    only reaches the policy through the LSTM carry).  Image size 36 is the
    smallest the Nature CNN's VALID-padded stack accepts."""

    def __init__(self, n_actions: int = 4, episode_len: int = 4,
                 size: int = 36, seed: int = 0):
        super().__init__(n_actions, episode_len, seed)
        rng = np.random.RandomState(seed + 1)
        self._frame = jnp.asarray(
            rng.randint(0, 256, size=(size, size, 1)), jnp.uint8
        )
        from baselines_tpu.envs.spaces import Box

        self.observation_space = Box(0, 255, (size, size, 1), np.uint8)

    def reset(self, key):
        return self._frame, FixedSequenceState(jnp.zeros((), jnp.int32))

    def step(self, key, state, action):
        reward = (action == self.sequence[state.t]).astype(jnp.float32)
        t = state.t + 1
        done = t >= self.episode_len
        return self._frame, FixedSequenceState(t), reward, done, {}
