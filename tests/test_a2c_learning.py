"""A2C learning tests (reference: test_identity.py/test_cartpole.py a2c rows)."""

import jax
import pytest

from baselines_tpu.algos.a2c.a2c import learn
from baselines_tpu.algos.common import build_env, evaluate
from baselines_tpu.core import logger


@pytest.fixture(autouse=True)
def quiet_logger():
    logger.configure(format_strs=[])
    yield
    logger.reset()


def test_a2c_discrete_identity():
    model = learn(
        env_id="DiscreteIdentity-v0",
        network="mlp",
        total_timesteps=60_000,
        seed=0,
        num_envs=8,
        nsteps=5,
        lr=2e-3,
        gamma=0.9,
        log_interval=10**6,
    )
    venv = build_env("DiscreteIdentity-v0", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=300)
    assert ret > 90, f"a2c identity mean return {ret}"


def test_a2c_cartpole():
    model = learn(
        env_id="CartPole-v1",
        network="mlp",
        total_timesteps=300_000,
        seed=0,
        num_envs=8,
        nsteps=5,
        lr=7e-4,
        log_interval=10**6,
    )
    venv = build_env("CartPole-v1", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=600)
    assert ret >= 150, f"a2c cartpole mean return {ret}"
