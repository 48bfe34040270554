"""Action / parameter noise for DDPG — parity with baselines/ddpg/noise.py.

- NormalActionNoise (noise.py:36-46): iid gaussian per step.
- OrnsteinUhlenbeckActionNoise (noise.py:49-67): temporally correlated, state
  carried functionally through the rollout scan.
- Adaptive parameter noise (noise.py:4-31 + ddpg_learner.py:155-170):
  gaussian perturbation of the actor's non-layernorm weights whose stddev is
  adapted toward a desired action-space distance (×/÷ 1.01).

All pure: noise state lives in the train-state pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from baselines_tpu.core.math import flatten_tree


def parse_noise_type(noise_type: str, nb_actions: int):
    """'adaptive-param_0.2', 'normal_0.1', 'ou_0.2', comma-separated
    (ddpg/ddpg.py:70-92)."""
    param_noise_std = None
    action_noise = None
    for tok in noise_type.split(","):
        tok = tok.strip()
        if not tok or tok == "none":
            continue
        name, _, val = tok.partition("_")
        std = float(val) if val else 0.1
        if name == "adaptive-param":
            param_noise_std = std
        elif name == "normal":
            action_noise = NormalActionNoise(sigma=std, nb_actions=nb_actions)
        elif name == "ou":
            action_noise = OUActionNoise(sigma=std, nb_actions=nb_actions)
        else:
            raise RuntimeError(f"unknown noise type {tok!r}")
    return action_noise, param_noise_std


class NormalActionNoise:
    stateful = False

    def __init__(self, sigma: float, nb_actions: int, mu: float = 0.0):
        self.sigma = sigma
        self.mu = mu
        self.nb_actions = nb_actions

    def init_state(self, nenvs: int):
        return jnp.zeros((nenvs, self.nb_actions), jnp.float32)

    def sample(self, key, state):
        noise = self.mu + self.sigma * jax.random.normal(key, state.shape)
        return noise, state


class OUActionNoise:
    """dx = theta*(mu - x)*dt + sigma*sqrt(dt)*N(0,1) (noise.py:49-67)."""

    stateful = True

    def __init__(
        self,
        sigma: float,
        nb_actions: int,
        mu: float = 0.0,
        theta: float = 0.15,
        dt: float = 1e-2,
    ):
        self.sigma = sigma
        self.mu = mu
        self.theta = theta
        self.dt = dt
        self.nb_actions = nb_actions

    def init_state(self, nenvs: int):
        return jnp.zeros((nenvs, self.nb_actions), jnp.float32)

    def sample(self, key, state):
        x = (
            state
            + self.theta * (self.mu - state) * self.dt
            + self.sigma * jnp.sqrt(self.dt) * jax.random.normal(key, state.shape)
        )
        return x, x


def is_perturbable(path) -> bool:
    """Perturb everything except layer-norm parameters
    (ddpg/models.py perturbable_vars)."""
    names = [getattr(p, "key", str(p)) for p in path]
    return not any("LayerNorm" in n or n.startswith("ln") for n in names)


def perturb_params(key, params, stddev):
    """actor params + N(0, stddev) on perturbable leaves
    (ddpg_learner.py get_perturbed_actor_updates)."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(key, len(leaves))
    new_leaves = []
    for (path, leaf), k in zip(leaves, keys):
        if is_perturbable(path):
            new_leaves.append(leaf + stddev * jax.random.normal(k, leaf.shape, leaf.dtype))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), new_leaves
    )


def adapt_param_noise_stddev(stddev, distance, desired: float, coefficient: float = 1.01):
    """noise.py:12-18: shrink when actions moved too far, grow otherwise."""
    return jnp.where(distance > desired, stddev / coefficient, stddev * coefficient)
