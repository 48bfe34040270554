"""Behavior cloning — parity with baselines/gail/behavior_clone.py: maximize
expert-action log-likelihood under the policy by Adam on minibatches."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from baselines_tpu.core import logger


def pretrain_bc(policy, params, dataset, key, max_iters: int = 10000,
                batch_size: int = 128, lr: float = 1e-4, log_interval: int = 0):
    """behavior_clone.learn analog; returns trained params."""
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p, ob, ac):
        pdflat, _, _ = policy.apply(p, ob)
        pd = policy.pdtype.pdfromflat(pdflat)
        return jnp.mean(pd.neglogp(ac))

    @jax.jit
    def step(carry, k):
        params, opt_state = carry
        ob, ac = dataset.sample(k, batch_size)
        loss, grads = jax.value_and_grad(loss_fn)(params, ob, ac)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    carry = (params, opt_state)
    for it in range(max_iters):
        key, k = jax.random.split(key)
        carry, loss = step(carry, k)
        if log_interval and it % log_interval == 0:
            logger.log(f"bc iter {it} loss {float(loss):.4f}")
    return carry[0]
