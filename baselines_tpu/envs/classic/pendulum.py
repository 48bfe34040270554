"""Pendulum-v1 swing-up as a pure-JAX env (continuous control for
ddpg/ppo DiagGaussian paths; gymnasium PendulumEnv dynamics)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from baselines_tpu.envs.base import JaxEnv, TimeLimit
from baselines_tpu.envs.spaces import Box


@struct.dataclass
class PendulumState:
    theta: jnp.ndarray
    theta_dot: jnp.ndarray


def _angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


class Pendulum(JaxEnv):
    MAX_SPEED = 8.0
    MAX_TORQUE = 2.0
    DT = 0.05
    G = 10.0
    M = 1.0
    L = 1.0

    def __init__(self):
        high = np.array([1.0, 1.0, self.MAX_SPEED], dtype=np.float32)
        self.observation_space = Box(-high, high)
        self.action_space = Box(-self.MAX_TORQUE, self.MAX_TORQUE, (1,))

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), jnp.float32, -jnp.pi, jnp.pi)
        theta_dot = jax.random.uniform(k2, (), jnp.float32, -1.0, 1.0)
        state = PendulumState(theta, theta_dot)
        return self._obs(state), state

    def _obs(self, s):
        return jnp.stack([jnp.cos(s.theta), jnp.sin(s.theta), s.theta_dot])

    def step(self, key, state, action):
        u = jnp.clip(jnp.reshape(action, ())[None][0], -self.MAX_TORQUE, self.MAX_TORQUE)
        th, thdot = state.theta, state.theta_dot
        cost = _angle_normalize(th) ** 2 + 0.1 * thdot**2 + 0.001 * u**2
        newthdot = thdot + (
            3 * self.G / (2 * self.L) * jnp.sin(th) + 3.0 / (self.M * self.L**2) * u
        ) * self.DT
        newthdot = jnp.clip(newthdot, -self.MAX_SPEED, self.MAX_SPEED)
        newth = th + newthdot * self.DT
        new_state = PendulumState(newth, newthdot)
        return (
            self._obs(new_state),
            new_state,
            -cost.astype(jnp.float32),
            jnp.zeros((), bool),
            {},
        )


def make_pendulum() -> JaxEnv:
    return TimeLimit(Pendulum(), 200)
