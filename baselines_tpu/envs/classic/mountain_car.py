"""MountainCar (discrete) and MountainCarContinuous as pure-JAX envs
(gymnasium dynamics; reference trains these via gym in
deepq/experiments/train_mountaincar.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from baselines_tpu.envs.base import JaxEnv, TimeLimit
from baselines_tpu.envs.spaces import Box, Discrete


@struct.dataclass
class CarState:
    position: jnp.ndarray
    velocity: jnp.ndarray


class MountainCar(JaxEnv):
    MIN_POS, MAX_POS = -1.2, 0.6
    MAX_SPEED = 0.07
    GOAL_POS = 0.5
    FORCE = 0.001
    GRAVITY = 0.0025

    def __init__(self):
        low = np.array([self.MIN_POS, -self.MAX_SPEED], np.float32)
        high = np.array([self.MAX_POS, self.MAX_SPEED], np.float32)
        self.observation_space = Box(low, high)
        self.action_space = Discrete(3)

    def reset(self, key):
        pos = jax.random.uniform(key, (), jnp.float32, -0.6, -0.4)
        state = CarState(pos, jnp.zeros((), jnp.float32))
        return self._obs(state), state

    def _obs(self, s):
        return jnp.stack([s.position, s.velocity])

    def step(self, key, state, action):
        velocity = state.velocity + (action - 1) * self.FORCE + jnp.cos(
            3 * state.position
        ) * (-self.GRAVITY)
        velocity = jnp.clip(velocity, -self.MAX_SPEED, self.MAX_SPEED)
        position = jnp.clip(state.position + velocity, self.MIN_POS, self.MAX_POS)
        velocity = jnp.where((position == self.MIN_POS) & (velocity < 0), 0.0, velocity)
        # gymnasium terminates only when moving forward at the goal
        # (velocity >= goal_velocity == 0)
        done = (position >= self.GOAL_POS) & (velocity >= 0.0)
        new_state = CarState(position, velocity)
        return self._obs(new_state), new_state, jnp.float32(-1.0), done, {}


class MountainCarContinuous(JaxEnv):
    MIN_POS, MAX_POS = -1.2, 0.6
    MAX_SPEED = 0.07
    GOAL_POS = 0.45
    POWER = 0.0015

    def __init__(self):
        low = np.array([self.MIN_POS, -self.MAX_SPEED], np.float32)
        high = np.array([self.MAX_POS, self.MAX_SPEED], np.float32)
        self.observation_space = Box(low, high)
        self.action_space = Box(-1.0, 1.0, (1,))

    def reset(self, key):
        pos = jax.random.uniform(key, (), jnp.float32, -0.6, -0.4)
        state = CarState(pos, jnp.zeros((), jnp.float32))
        return self._obs(state), state

    def _obs(self, s):
        return jnp.stack([s.position, s.velocity])

    def step(self, key, state, action):
        force = jnp.clip(jnp.reshape(action, ()), -1.0, 1.0)
        velocity = state.velocity + force * self.POWER - 0.0025 * jnp.cos(3 * state.position)
        velocity = jnp.clip(velocity, -self.MAX_SPEED, self.MAX_SPEED)
        position = jnp.clip(state.position + velocity, self.MIN_POS, self.MAX_POS)
        velocity = jnp.where((position == self.MIN_POS) & (velocity < 0), 0.0, velocity)
        done = (position >= self.GOAL_POS) & (velocity >= 0.0)
        reward = jnp.where(done, 100.0, 0.0) - 0.1 * force**2
        new_state = CarState(position, velocity)
        return self._obs(new_state), new_state, reward.astype(jnp.float32), done, {}


def make_mountain_car() -> JaxEnv:
    return TimeLimit(MountainCar(), 200)


def make_mountain_car_continuous() -> JaxEnv:
    return TimeLimit(MountainCarContinuous(), 999)
