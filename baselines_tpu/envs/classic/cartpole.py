"""CartPole with gymnasium-faithful dynamics, as a pure-JAX env.

The reference trains CartPole-v0/v1 through gym (test_cartpole.py:16-42,
deepq/experiments/train_cartpole.py); here the physics runs on device so the
whole rollout fuses into the training step.  Dynamics follow the classic
Barto-Sutton-Anderson cartpole as implemented by gym's CartPoleEnv
(Euler integration, force ±10, tau 0.02, termination at |x|>2.4 or
|theta|>12°), so learning-threshold tests are comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from baselines_tpu.envs.base import JaxEnv, TimeLimit
from baselines_tpu.envs.spaces import Box, Discrete


@struct.dataclass
class CartPoleState:
    x: jnp.ndarray
    x_dot: jnp.ndarray
    theta: jnp.ndarray
    theta_dot: jnp.ndarray


class CartPole(JaxEnv):
    GRAVITY = 9.8
    MASSCART = 1.0
    MASSPOLE = 0.1
    TOTAL_MASS = MASSCART + MASSPOLE
    LENGTH = 0.5  # half pole length
    POLEMASS_LENGTH = MASSPOLE * LENGTH
    FORCE_MAG = 10.0
    TAU = 0.02
    THETA_THRESHOLD = 12 * 2 * np.pi / 360
    X_THRESHOLD = 2.4

    def __init__(self):
        high = np.array(
            [
                self.X_THRESHOLD * 2,
                np.finfo(np.float32).max,
                self.THETA_THRESHOLD * 2,
                np.finfo(np.float32).max,
            ],
            dtype=np.float32,
        )
        self.observation_space = Box(-high, high)
        self.action_space = Discrete(2)

    def reset(self, key):
        vals = jax.random.uniform(key, (4,), jnp.float32, -0.05, 0.05)
        state = CartPoleState(vals[0], vals[1], vals[2], vals[3])
        return self._obs(state), state

    def _obs(self, s: CartPoleState):
        return jnp.stack([s.x, s.x_dot, s.theta, s.theta_dot])

    def step(self, key, state: CartPoleState, action):
        force = jnp.where(action == 1, self.FORCE_MAG, -self.FORCE_MAG)
        costheta = jnp.cos(state.theta)
        sintheta = jnp.sin(state.theta)
        temp = (
            force + self.POLEMASS_LENGTH * state.theta_dot**2 * sintheta
        ) / self.TOTAL_MASS
        thetaacc = (self.GRAVITY * sintheta - costheta * temp) / (
            self.LENGTH * (4.0 / 3.0 - self.MASSPOLE * costheta**2 / self.TOTAL_MASS)
        )
        xacc = temp - self.POLEMASS_LENGTH * thetaacc * costheta / self.TOTAL_MASS
        x = state.x + self.TAU * state.x_dot
        x_dot = state.x_dot + self.TAU * xacc
        theta = state.theta + self.TAU * state.theta_dot
        theta_dot = state.theta_dot + self.TAU * thetaacc
        new_state = CartPoleState(x, x_dot, theta, theta_dot)
        done = (
            (x < -self.X_THRESHOLD)
            | (x > self.X_THRESHOLD)
            | (theta < -self.THETA_THRESHOLD)
            | (theta > self.THETA_THRESHOLD)
        )
        reward = jnp.float32(1.0)
        return self._obs(new_state), new_state, reward, done, {}


    def render_frame(self, state: CartPoleState, width: int = 600, height: int = 400):
        """Host-side rendering for video capture (gym CartPoleEnv-style
        drawing, simplified)."""
        frame = np.full((height, width, 3), 255, np.uint8)
        world_width = self.X_THRESHOLD * 2
        scale = width / world_width
        carty = int(height * 0.8)
        cartx = int(float(state.x) * scale + width / 2.0)
        # track
        frame[carty + 20 : carty + 22, :] = 0
        # cart
        frame[carty : carty + 20, max(cartx - 30, 0) : min(cartx + 30, width)] = (0, 0, 0)
        # pole
        pole_len = int(scale * self.LENGTH * 2)
        theta = float(state.theta)
        for r in range(pole_len):
            px = int(cartx + np.sin(theta) * r)
            py = int(carty - np.cos(theta) * r)
            if 0 <= px < width - 3 and 0 <= py < height - 3:
                frame[py : py + 3, px : px + 3] = (202, 152, 101)
        return frame


def make_cartpole(version: int = 1) -> JaxEnv:
    """CartPole-v0 (200 steps) / CartPole-v1 (500 steps)."""
    return TimeLimit(CartPole(), 200 if version == 0 else 500)
