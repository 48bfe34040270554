"""Microbatched gradient accumulation must match plain full-minibatch
gradients (reference: ppo2/test_microbatches.py:12-32)."""

import jax
import jax.numpy as jnp

from baselines_tpu.algos.common import adam_optimizer, build_env, dealias
from baselines_tpu.algos.ppo import ppo
from baselines_tpu.core.rng import seed_key
from baselines_tpu.core.schedules import resolve_fraction_schedule
from baselines_tpu.nn import build_policy


def test_microbatch_equivalence():
    venv = build_env("CartPole-v1", 4)
    policy = build_policy(venv.observation_space, venv.action_space, "mlp")
    key = seed_key(0)
    key, kr, ki = jax.random.split(key, 3)
    obs, env_state = venv.reset(kr)
    params = policy.init(ki, obs)
    tx = adam_optimizer(0.5)

    def mk(micro):
        return jax.jit(
            ppo.make_update_fn(
                policy, venv, tx, nsteps=16, nminibatches=1, noptepochs=1,
                gamma=0.99, lam=0.95, ent_coef=0.0, vf_coef=0.5,
                lr_fn=resolve_fraction_schedule(3e-4),
                cliprange_fn=resolve_fraction_schedule(0.2),
                nupdates=100, microbatch_size=micro,
            )
        )

    def mkstate():
        return dealias(
            ppo.PPOTrainState(
                params=params, opt_state=tx.init(params), key=key,
                env_state=env_state, obs=obs, rnn_state=None,
                last_done=jnp.zeros((4,), bool),
                update_idx=jnp.zeros((), jnp.int32),
            )
        )

    s_plain, _ = mk(None)(mkstate())
    for micro in (16, 8):
        s_micro, _ = mk(micro)(mkstate())
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), s_plain.params, s_micro.params
        )
        md = max(jax.tree_util.tree_leaves(diffs))
        assert md < 1e-5, f"microbatch={micro} param divergence {md}"
