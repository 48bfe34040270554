"""Advantage / return estimators as device scans.

The reference computes GAE in a reverse python loop over numpy on the host
(ppo2/runner.py:56-65) and n-step returns per env in python
(a2c/utils.py:147-153 discount_with_dones, a2c/runner.py:58-69).  Here both
are a single reverse ``lax.scan`` over time-major device arrays, fused by XLA
into the training step.

Convention: index t holds (obs_t, value_t, action_t, reward_t, done_t) where
done_t means the episode ended AT step t (obs_{t+1} is a reset obs).  This is
the same trajectory content as the reference's (obs, dones-before-step)
pairing, re-indexed; the recursions below are algebraically identical to
ppo2/runner.py:56-65.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gae(rewards, values, dones, last_value, gamma: float, lam: float):
    """Generalized advantage estimation over time-major (T, N) arrays.

    Returns (advantages, returns) with returns = advantages + values
    (ppo2/runner.py:64-65).
    """
    nonterminal = 1.0 - dones.astype(jnp.float32)
    next_values = jnp.concatenate([values[1:], last_value[None]], axis=0)

    def body(lastgaelam, x):
        reward, value, nextvalue, nonterm = x
        delta = reward + gamma * nextvalue * nonterm - value
        lastgaelam = delta + gamma * lam * nonterm * lastgaelam
        return lastgaelam, lastgaelam

    _, advs = jax.lax.scan(
        body,
        jnp.zeros_like(last_value),
        (rewards, values, next_values, nonterminal),
        reverse=True,
    )
    return advs, advs + values


def nstep_returns(rewards, dones, last_value, gamma: float):
    """Bootstrapped n-step returns: R_t = r_t + gamma * R_{t+1} * (1-done_t),
    R_T seeded with V(obs_T) (a2c/runner.py:58-69 semantics)."""
    nonterminal = 1.0 - dones.astype(jnp.float32)

    def body(ret, x):
        reward, nonterm = x
        ret = reward + gamma * nonterm * ret
        return ret, ret

    _, rets = jax.lax.scan(body, last_value, (rewards, nonterminal), reverse=True)
    return rets


def discount_with_dones(rewards, dones, gamma: float):
    """Pure discounted sum with done masking, no bootstrap
    (a2c/utils.py:147-153)."""
    return nstep_returns(rewards, dones, jnp.zeros_like(rewards[-1]), gamma)
