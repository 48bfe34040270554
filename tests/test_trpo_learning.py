"""TRPO learning tests (reference: test_identity.py/test_cartpole.py
trpo_mpi rows)."""

import jax
import pytest

from baselines_tpu.algos.common import build_env, evaluate
from baselines_tpu.algos.trpo.trpo import learn
from baselines_tpu.core import logger


@pytest.fixture(autouse=True)
def quiet_logger():
    logger.configure(format_strs=[])
    yield
    logger.reset()


def test_trpo_discrete_identity():
    model = learn(
        env_id="DiscreteIdentity-v0",
        network="mlp",
        total_timesteps=40_000,
        seed=0,
        num_envs=8,
        timesteps_per_batch=512,
        max_kl=0.01,
        gamma=0.9,
        lam=1.0,
        log_interval=0,
    )
    venv = build_env("DiscreteIdentity-v0", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=300)
    assert ret > 90, f"trpo identity mean return {ret}"


def test_trpo_cartpole():
    model = learn(
        env_id="CartPole-v1",
        network="mlp",
        total_timesteps=150_000,
        seed=0,
        num_envs=8,
        timesteps_per_batch=1024,
        max_kl=0.01,
        gamma=0.99,
        lam=0.98,
        vf_iters=5,
        vf_stepsize=1e-3,
        log_interval=0,
    )
    venv = build_env("CartPole-v1", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=600)
    assert ret >= 150, f"trpo cartpole mean return {ret}"


def test_trpo_continuous():
    model = learn(
        env_id="BoxIdentity-v0",
        network="mlp",
        total_timesteps=40_000,
        seed=0,
        num_envs=8,
        timesteps_per_batch=512,
        max_kl=0.01,
        gamma=0.9,
        lam=1.0,
        log_interval=0,
    )
    venv = build_env("BoxIdentity-v0", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=300)
    assert ret > -20, f"trpo box identity mean return {ret}"
