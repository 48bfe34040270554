"""DQN learning tests (reference ladder: test_identity.py deepq row,
test_cartpole.py deepq row), including the prioritized+dueling+double path."""

import jax
import pytest

from baselines_tpu.algos.common import build_env, evaluate
from baselines_tpu.algos.dqn.dqn import learn
from baselines_tpu.core import logger


@pytest.fixture(autouse=True)
def quiet_logger():
    logger.configure(format_strs=[])
    yield
    logger.reset()


def test_dqn_discrete_identity():
    model = learn(
        env_id="DiscreteIdentity-v0",
        network="mlp",
        total_timesteps=30_000,
        seed=0,
        num_envs=4,
        lr=1e-3,
        gamma=0.9,
        exploration_fraction=0.3,
        learning_starts=500,
        train_freq=1,
        batch_size=64,
        target_network_update_freq=250,
        chunk_size=128,
        print_freq=0,
    )
    venv = build_env("DiscreteIdentity-v0", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=300)
    assert ret > 90, f"dqn identity mean return {ret}"


def test_dqn_cartpole_prioritized_dueling():
    model = learn(
        env_id="CartPole-v1",
        network="mlp",
        total_timesteps=150_000,
        seed=0,
        num_envs=4,
        lr=1e-3,
        gamma=0.99,
        exploration_fraction=0.2,
        learning_starts=1000,
        train_freq=2,
        batch_size=64,
        target_network_update_freq=500,
        prioritized_replay=True,
        dueling=True,
        double_q=True,
        chunk_size=250,
        print_freq=0,
    )
    venv = build_env("CartPole-v1", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=600)
    assert ret >= 150, f"dqn cartpole mean return {ret}"


def test_dqn_param_noise():
    """deepq param-noise exploration path (build_graph.py:202-314)."""
    model = learn(
        env_id="CartPole-v1",
        network="mlp",
        total_timesteps=100_000,
        seed=0,
        num_envs=4,
        lr=1e-3,
        gamma=0.99,
        exploration_fraction=0.2,
        learning_starts=1000,
        train_freq=2,
        batch_size=64,
        target_network_update_freq=500,
        param_noise=True,
        layer_norm=True,
        chunk_size=250,
        print_freq=0,
    )
    venv = build_env("CartPole-v1", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=600)
    assert ret >= 150, f"param-noise dqn cartpole mean return {ret}"
