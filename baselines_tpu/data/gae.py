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


def affine_reverse_scan(coefs, deltas, init):
    """y_t = deltas_t + coefs_t * y_{t+1} with y_T = init, all t at once.

    Both GAE and n-step returns are first-order linear recurrences, i.e.
    compositions of affine maps f_t(x) = d_t + c_t x.  Affine composition
    is associative, so the whole backward sweep runs as a single
    ``lax.associative_scan`` in O(log T) depth instead of T sequential
    scan steps — on a TPU where each tiny scan step costs fixed latency,
    this collapses the recurrence from ~T dispatch-bound steps to ~log2(T)
    rounds of vectorized math."""
    c = coefs[::-1]
    d = deltas[::-1]
    d = d.at[0].add(c[0] * init)

    def combine(a, b):
        # b is applied AFTER the accumulated prefix a:
        # f_b(f_a(x)) = (d_b + c_b d_a) + (c_b c_a) x
        ca, da = a
        cb, db = b
        return ca * cb, db + cb * da

    _, y = jax.lax.associative_scan(combine, (c, d))
    return y[::-1]


def gae(rewards, values, dones, last_value, gamma: float, lam: float):
    """Generalized advantage estimation over time-major (T, N) arrays.

    Returns (advantages, returns) with returns = advantages + values
    (ppo2/runner.py:64-65); the recursion is algebraically identical to
    the reference's reverse python loop (ppo2/runner.py:56-65), evaluated
    as an associative scan."""
    nonterminal = 1.0 - dones.astype(jnp.float32)
    next_values = jnp.concatenate([values[1:], last_value[None]], axis=0)
    deltas = rewards + gamma * next_values * nonterminal - values
    advs = affine_reverse_scan(
        gamma * lam * nonterminal, deltas, jnp.zeros_like(last_value)
    )
    return advs, advs + values


def nstep_returns(rewards, dones, last_value, gamma: float):
    """Bootstrapped n-step returns: R_t = r_t + gamma * R_{t+1} * (1-done_t),
    R_T seeded with V(obs_T) (a2c/runner.py:58-69 semantics)."""
    nonterminal = 1.0 - dones.astype(jnp.float32)
    return affine_reverse_scan(gamma * nonterminal, rewards, last_value)


def discount_with_dones(rewards, dones, gamma: float):
    """Pure discounted sum with done masking, no bootstrap
    (a2c/utils.py:147-153)."""
    return nstep_returns(rewards, dones, jnp.zeros_like(rewards[-1]), gamma)
