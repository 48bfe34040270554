"""ACKTR learning tests (reference: test_identity.py/test_cartpole.py acktr
rows) — exercises the dense K-FAC optimizer end to end."""

import jax
import pytest

from baselines_tpu.algos.acktr.acktr import learn
from baselines_tpu.algos.common import build_env, evaluate
from baselines_tpu.core import logger


@pytest.fixture(autouse=True)
def quiet_logger():
    logger.configure(format_strs=[])
    yield
    logger.reset()


def test_acktr_discrete_identity():
    model = learn(
        env_id="DiscreteIdentity-v0",
        network="mlp",
        total_timesteps=60_000,
        seed=0,
        num_envs=8,
        nsteps=20,
        gamma=0.9,
        log_interval=0,
    )
    venv = build_env("DiscreteIdentity-v0", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=300)
    assert ret > 90, f"acktr identity mean return {ret}"


def test_acktr_cartpole():
    model = learn(
        env_id="CartPole-v1",
        network="mlp",
        total_timesteps=300_000,
        seed=0,
        num_envs=8,
        nsteps=20,
        log_interval=0,
    )
    venv = build_env("CartPole-v1", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=600)
    assert ret >= 150, f"acktr cartpole mean return {ret}"


def test_acktr_continuous_identity():
    model = learn(
        env_id="BoxIdentity-v0",
        network="mlp",
        total_timesteps=60_000,
        seed=0,
        num_envs=8,
        nsteps=20,
        gamma=0.9,
        lr=0.1,
        log_interval=0,
    )
    venv = build_env("BoxIdentity-v0", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=300)
    assert ret > -20, f"acktr box identity mean return {ret}"
