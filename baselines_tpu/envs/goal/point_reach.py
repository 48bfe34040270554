"""A goal-conditioned reaching env (FetchReach-class workload) as pure JAX.

The reference exercises HER on robotics goal envs with Dict observations
{observation, achieved_goal, desired_goal} and sparse -1/0 rewards computed
by compute_reward (her/her_sampler.py:45-55 calls env.compute_reward on
relabeled goals).  This point-mass version keeps that exact contract —
including a recomputable reward function usable for relabeling inside jit —
while running entirely on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from baselines_tpu.envs.base import JaxEnv, TimeLimit
from baselines_tpu.envs.spaces import Box, DictSpace


@struct.dataclass
class PointReachState:
    pos: jnp.ndarray  # (dim,)
    goal: jnp.ndarray  # (dim,)


class PointReach(JaxEnv):
    """Velocity-controlled point mass in [-1,1]^dim; sparse reward 0 when
    within `distance_threshold` of the goal else -1 (FetchReach reward
    semantics)."""

    def __init__(self, dim: int = 2, distance_threshold: float = 0.05, max_speed: float = 0.1):
        self.dim = dim
        self.distance_threshold = float(distance_threshold)
        self.max_speed = float(max_speed)
        obs_sp = Box(-1.0, 1.0, (dim,))
        goal_sp = Box(-1.0, 1.0, (dim,))
        self.observation_space = DictSpace(
            {"observation": obs_sp, "achieved_goal": goal_sp, "desired_goal": goal_sp}
        )
        self.action_space = Box(-1.0, 1.0, (dim,))

    def compute_reward(self, achieved_goal, desired_goal):
        """Recomputable sparse reward for hindsight relabeling
        (the env.compute_reward contract used by her/her_sampler.py:45-55)."""
        d = jnp.linalg.norm(achieved_goal - desired_goal, axis=-1)
        return -(d > self.distance_threshold).astype(jnp.float32)

    def _obs(self, state: PointReachState):
        return {
            "observation": state.pos,
            "achieved_goal": state.pos,
            "desired_goal": state.goal,
        }

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        pos = jax.random.uniform(k1, (self.dim,), jnp.float32, -1.0, 1.0)
        goal = jax.random.uniform(k2, (self.dim,), jnp.float32, -1.0, 1.0)
        state = PointReachState(pos, goal)
        return self._obs(state), state

    def step(self, key, state, action):
        action = jnp.clip(action, -1.0, 1.0) * self.max_speed
        pos = jnp.clip(state.pos + action, -1.0, 1.0)
        new_state = PointReachState(pos, state.goal)
        reward = self.compute_reward(pos, state.goal)
        done = jnp.zeros((), bool)  # episodes end by time limit only (Fetch-style)
        return self._obs(new_state), new_state, reward, done, {"is_success": reward == 0.0}


def make_point_reach(dim: int = 2) -> JaxEnv:
    return TimeLimit(PointReach(dim=dim), 50)
