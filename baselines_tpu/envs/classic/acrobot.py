"""Acrobot-v1 as a pure-JAX env (gymnasium AcrobotEnv dynamics: two-link
pendulum, RK4 integration, torque in {-1, 0, +1})."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from baselines_tpu.envs.base import JaxEnv, TimeLimit
from baselines_tpu.envs.spaces import Box, Discrete


@struct.dataclass
class AcrobotState:
    s: jnp.ndarray  # [theta1, theta2, dtheta1, dtheta2]


def _wrap(x, lo, hi):
    diff = hi - lo
    return ((x - lo) % diff) + lo


class Acrobot(JaxEnv):
    DT = 0.2
    L1 = 1.0
    L2 = 1.0
    M1 = 1.0
    M2 = 1.0
    LC1 = 0.5
    LC2 = 0.5
    I1 = 1.0
    I2 = 1.0
    G = 9.8
    MAX_VEL_1 = 4 * np.pi
    MAX_VEL_2 = 9 * np.pi

    def __init__(self):
        high = np.array(
            [1.0, 1.0, 1.0, 1.0, self.MAX_VEL_1, self.MAX_VEL_2], np.float32
        )
        self.observation_space = Box(-high, high)
        self.action_space = Discrete(3)

    def reset(self, key):
        s = jax.random.uniform(key, (4,), jnp.float32, -0.1, 0.1)
        state = AcrobotState(s)
        return self._obs(state), state

    def _obs(self, st):
        t1, t2, dt1, dt2 = st.s[0], st.s[1], st.s[2], st.s[3]
        return jnp.stack([jnp.cos(t1), jnp.sin(t1), jnp.cos(t2), jnp.sin(t2), dt1, dt2])

    def _dsdt(self, s_augmented):
        m1, m2, l1, lc1, lc2, i1, i2, g = (
            self.M1,
            self.M2,
            self.L1,
            self.LC1,
            self.LC2,
            self.I1,
            self.I2,
            self.G,
        )
        a = s_augmented[-1]
        s = s_augmented[:-1]
        theta1, theta2, dtheta1, dtheta2 = s[0], s[1], s[2], s[3]
        d1 = (
            m1 * lc1**2
            + m2 * (l1**2 + lc2**2 + 2 * l1 * lc2 * jnp.cos(theta2))
            + i1
            + i2
        )
        d2 = m2 * (lc2**2 + l1 * lc2 * jnp.cos(theta2)) + i2
        phi2 = m2 * lc2 * g * jnp.cos(theta1 + theta2 - jnp.pi / 2.0)
        phi1 = (
            -m2 * l1 * lc2 * dtheta2**2 * jnp.sin(theta2)
            - 2 * m2 * l1 * lc2 * dtheta2 * dtheta1 * jnp.sin(theta2)
            + (m1 * lc1 + m2 * l1) * g * jnp.cos(theta1 - jnp.pi / 2)
            + phi2
        )
        # "book" variant of the dynamics (gym default)
        ddtheta2 = (
            a + d2 / d1 * phi1 - m2 * l1 * lc2 * dtheta1**2 * jnp.sin(theta2) - phi2
        ) / (m2 * lc2**2 + i2 - d2**2 / d1)
        ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
        return jnp.stack([dtheta1, dtheta2, ddtheta1, ddtheta2, jnp.zeros_like(a)])

    def _rk4(self, y0, dt):
        k1 = self._dsdt(y0)
        k2 = self._dsdt(y0 + dt / 2 * k1)
        k3 = self._dsdt(y0 + dt / 2 * k2)
        k4 = self._dsdt(y0 + dt * k3)
        return y0 + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

    def step(self, key, state, action):
        torque = jnp.asarray(action, jnp.float32) - 1.0
        s_augmented = jnp.concatenate([state.s, torque[None]])
        ns = self._rk4(s_augmented, self.DT)[:4]
        ns = ns.at[0].set(_wrap(ns[0], -jnp.pi, jnp.pi))
        ns = ns.at[1].set(_wrap(ns[1], -jnp.pi, jnp.pi))
        ns = ns.at[2].set(jnp.clip(ns[2], -self.MAX_VEL_1, self.MAX_VEL_1))
        ns = ns.at[3].set(jnp.clip(ns[3], -self.MAX_VEL_2, self.MAX_VEL_2))
        new_state = AcrobotState(ns)
        done = -jnp.cos(ns[0]) - jnp.cos(ns[1] + ns[0]) > 1.0
        reward = jnp.where(done, 0.0, -1.0).astype(jnp.float32)
        return self._obs(new_state), new_state, reward, done, {}


def make_acrobot() -> JaxEnv:
    return TimeLimit(Acrobot(), 500)
