"""ppo1 (pposgd_simple semantics) learning + semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baselines_tpu.algos.common import build_env, evaluate
from baselines_tpu.algos.ppo1.ppo1 import learn
from baselines_tpu.core import logger


@pytest.fixture(autouse=True)
def quiet_logger():
    logger.configure(format_strs=[])
    yield
    logger.reset()


def test_ppo1_cartpole():
    model = learn(
        env_id="CartPole-v1",
        total_timesteps=150_000,
        seed=0,
        num_envs=8,
        timesteps_per_actorbatch=1024,
        optim_stepsize=1e-3,
        optim_batchsize=256,
        schedule="linear",
        log_interval=1000,
    )
    venv = build_env("CartPole-v1", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=500)
    assert ret > 150, f"ppo1 cartpole mean return {ret}"


def test_ppo1_identity():
    model = learn(
        env_id="DiscreteIdentity-v0",
        total_timesteps=60_000,
        seed=0,
        num_envs=8,
        timesteps_per_actorbatch=512,
        optim_stepsize=3e-3,
        optim_batchsize=128,
        log_interval=1000,
    )
    venv = build_env("DiscreteIdentity-v0", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=120)
    assert ret > 90, f"ppo1 identity mean return {ret}"


def test_ppo1_semantics_differ_from_ppo2():
    """The two generations must not produce identical training: ppo1 uses
    batch-level adv standardization + unclipped value MSE, so after one
    update from identical inits the params differ."""
    from baselines_tpu.algos.ppo.ppo import learn as learn2

    common = dict(
        env_id="DiscreteIdentity-v0",
        total_timesteps=512 * 1,  # exactly one update
        seed=0,
        num_envs=8,
        log_interval=1000,
    )
    m1 = learn(
        timesteps_per_actorbatch=512,
        optim_epochs=4,
        optim_stepsize=1e-3,
        optim_batchsize=128,
        schedule="constant",
        **common,
    )
    m2 = learn2(
        nsteps=64,
        noptepochs=4,
        lr=1e-3,
        nminibatches=4,
        cliprange=0.2,
        **common,
    )
    l1 = jax.tree_util.tree_leaves(m1.state.params)
    l2 = jax.tree_util.tree_leaves(m2.state.params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(l1, l2)
    ), "ppo1 update was identical to ppo2 — semantics flags not applied"
