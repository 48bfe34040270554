"""GAE / n-step returns vs a literal numpy transcription of the reference
recursions (ppo2/runner.py:56-65, a2c/utils.py:147-153)."""

import jax.numpy as jnp
import numpy as np

from baselines_tpu.data.gae import discount_with_dones, gae, nstep_returns


def _ref_gae(rewards, values, dones, last_value, gamma, lam):
    T, N = rewards.shape
    advs = np.zeros_like(rewards)
    lastgaelam = np.zeros(N, np.float32)
    for t in reversed(range(T)):
        nonterm = 1.0 - dones[t]
        nextvalue = last_value if t == T - 1 else values[t + 1]
        delta = rewards[t] + gamma * nextvalue * nonterm - values[t]
        advs[t] = lastgaelam = delta + gamma * lam * nonterm * lastgaelam
    return advs, advs + values


def test_gae_matches_reference():
    rng = np.random.RandomState(0)
    T, N = 16, 4
    rewards = rng.randn(T, N).astype(np.float32)
    values = rng.randn(T, N).astype(np.float32)
    dones = (rng.rand(T, N) < 0.15).astype(np.float32)
    last_value = rng.randn(N).astype(np.float32)
    adv_ref, ret_ref = _ref_gae(rewards, values, dones, last_value, 0.99, 0.95)
    adv, ret = gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(last_value), 0.99, 0.95,
    )
    assert np.allclose(np.asarray(adv), adv_ref, atol=1e-5)
    assert np.allclose(np.asarray(ret), ret_ref, atol=1e-5)


def test_nstep_equals_gae_lam1():
    rng = np.random.RandomState(1)
    T, N = 8, 3
    rewards = rng.randn(T, N).astype(np.float32)
    values = rng.randn(T, N).astype(np.float32)
    dones = (rng.rand(T, N) < 0.2).astype(np.float32)
    last_value = rng.randn(N).astype(np.float32)
    adv, ret = gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(last_value), 0.9, 1.0,
    )
    rets2 = nstep_returns(jnp.asarray(rewards), jnp.asarray(dones), jnp.asarray(last_value), 0.9)
    assert np.allclose(np.asarray(ret), np.asarray(rets2), atol=1e-5)


def test_discount_with_dones():
    # reference a2c/utils.py:147-153 semantics
    rewards = jnp.asarray([[1.0], [1.0], [1.0], [1.0]])
    dones = jnp.asarray([[0.0], [1.0], [0.0], [0.0]])
    got = np.asarray(discount_with_dones(rewards, dones, 0.5)).ravel()
    # t=3: 1; t=2: 1+.5*1=1.5; t=1: done -> 1; t=0: 1+.5*1=1.5
    assert np.allclose(got, [1.5, 1.0, 1.5, 1.0])
