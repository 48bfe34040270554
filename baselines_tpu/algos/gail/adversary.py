"""GAIL discriminator — parity with baselines/gail/adversary.py
TransitionClassifier (:21-87): an MLP over concat(normalized obs, action)
producing a logit; generator reward = -log(1 - σ(logit) + eps) (:45-47);
trained with sigmoid cross-entropy generator-vs-expert plus an entropy bonus
(entcoeff=1e-3, :49-60)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from baselines_tpu.core.running_stats import RunningMeanStd


class Discriminator(nn.Module):
    hidden_size: int = 100
    num_layers: int = 2

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        for _ in range(self.num_layers):
            x = jnp.tanh(nn.Dense(self.hidden_size)(x))
        return nn.Dense(1)(x)[..., 0]  # logits


def _logit_bernoulli_entropy(logits):
    """adversary.py:7-12."""
    ent = (1.0 - jax.nn.sigmoid(logits)) * logits - jax.nn.log_sigmoid(logits)
    return ent


def adversary_loss(disc: Discriminator, params, obs_rms: RunningMeanStd,
                   gen_obs, gen_acs, exp_obs, exp_acs, entcoeff: float = 1e-3):
    """BCE(gen→0, expert→1) - entcoeff·H (adversary.py:49-60)."""

    def norm(o):
        return obs_rms.normalize(o, clip=None)

    gen_logits = disc.apply(params, norm(gen_obs), gen_acs)
    exp_logits = disc.apply(params, norm(exp_obs), exp_acs)

    def bce(logits, labels):
        return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))

    gen_loss = jnp.mean(bce(gen_logits, jnp.zeros_like(gen_logits)))
    exp_loss = jnp.mean(bce(exp_logits, jnp.ones_like(exp_logits)))
    logits = jnp.concatenate([gen_logits, exp_logits])
    entropy = jnp.mean(_logit_bernoulli_entropy(logits))
    total = gen_loss + exp_loss - entcoeff * entropy
    gen_acc = jnp.mean((jax.nn.sigmoid(gen_logits) < 0.5).astype(jnp.float32))
    exp_acc = jnp.mean((jax.nn.sigmoid(exp_logits) > 0.5).astype(jnp.float32))
    return total, {"gen_acc": gen_acc, "exp_acc": exp_acc}


def adversary_reward(disc: Discriminator, params, obs_rms: RunningMeanStd, obs, acs):
    """-log(1 - D) (adversary.py:45-47)."""
    logits = disc.apply(params, obs_rms.normalize(obs, clip=None), acs)
    return -jnp.log(1.0 - jax.nn.sigmoid(logits) + 1e-8)
