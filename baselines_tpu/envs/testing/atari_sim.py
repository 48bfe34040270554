"""AtariSim — a synthetic Atari-class workload env, entirely on device.

Produces 84×84×4 uint8 observations from a cheap procedural state evolution
(moving sprite + score-dependent reward), with episode structure.  This is a
BENCHMARKING env: it has the exact tensor shapes/dtypes of the DeepMind
Atari pipeline (atari_wrappers.py:266-289 output) so the full
rollout+GAE+update pipeline can be measured at Atari scale on a chip with no
host emulator in the loop (the real emulator path is envs/atari.py).
Learning on it is trivial by design (reward follows action parity matching
the sprite quadrant) so it doubles as a CNN learning smoke test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from baselines_tpu.envs.base import JaxEnv
from baselines_tpu.envs.spaces import Box, Discrete


@struct.dataclass
class AtariSimState:
    x: jnp.ndarray  # sprite position (2,) int32
    v: jnp.ndarray  # sprite velocity (2,) int32
    t: jnp.ndarray


class AtariSim(JaxEnv):
    SIZE = 84
    CHANNELS = 4

    def __init__(self, n_actions: int = 6, episode_len: int = 1000):
        self.observation_space = Box(0, 255, (self.SIZE, self.SIZE, self.CHANNELS), np.uint8)
        self.action_space = Discrete(n_actions)
        self.episode_len = episode_len
        self.n_actions = n_actions

    def _obs(self, state: AtariSimState):
        rows = jax.lax.broadcasted_iota(jnp.int32, (self.SIZE, self.SIZE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (self.SIZE, self.SIZE), 1)
        sprite = (
            (jnp.abs(rows - state.x[0]) < 4) & (jnp.abs(cols - state.x[1]) < 4)
        ).astype(jnp.uint8) * 255
        background = ((rows * 7 + cols * 13 + state.t) % 29).astype(jnp.uint8)
        frame = jnp.maximum(sprite, background)
        return jnp.repeat(frame[:, :, None], self.CHANNELS, axis=2)

    def reset(self, key):
        kx, kv = jax.random.split(key)
        x = jax.random.randint(kx, (2,), 10, self.SIZE - 10, jnp.int32)
        v = jax.random.randint(kv, (2,), -2, 3, jnp.int32)
        state = AtariSimState(x, v, jnp.zeros((), jnp.int32))
        return self._obs(state), state

    def step(self, key, state, action):
        x = state.x + state.v
        bounce = (x < 4) | (x >= self.SIZE - 4)
        v = jnp.where(bounce, -state.v, state.v)
        x = jnp.clip(x, 4, self.SIZE - 5)
        t = state.t + 1
        # reward: +1 when the action parity matches the sprite quadrant
        quadrant = (x[0] >= self.SIZE // 2).astype(jnp.int32) * 2 + (
            x[1] >= self.SIZE // 2
        ).astype(jnp.int32)
        reward = (action % 4 == quadrant).astype(jnp.float32)
        done = t >= self.episode_len
        new_state = AtariSimState(x, v, t)
        return self._obs(new_state), new_state, reward, done, {}
