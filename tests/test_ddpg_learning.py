"""DDPG learning tests (reference: test_identity.py ddpg row with
layer_norm=True, threshold -0.1 at 30k steps; plus the noise/popart smoke
configs of ddpg/test_smoke.py:1-16)."""

import jax
import pytest

from baselines_tpu.algos.common import build_env, evaluate
from baselines_tpu.algos.ddpg.ddpg import learn
from baselines_tpu.core import logger


@pytest.fixture(autouse=True)
def quiet_logger():
    logger.configure(format_strs=[])
    yield
    logger.reset()


def test_ddpg_box_identity_param_noise():
    model = learn(
        env_id="BoxIdentity-v0",
        network="mlp",
        total_timesteps=30_000,
        seed=0,
        num_envs=4,
        noise_type="adaptive-param_0.2",
        gamma=0.9,
        actor_lr=1e-3,
        critic_lr=1e-3,
        layer_norm=True,
        log_interval=0,
    )
    venv = build_env("BoxIdentity-v0", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=300)
    assert ret > -10, f"ddpg box identity return {ret} (reference threshold -0.1/step)"


def test_ddpg_pendulum_ou_noise():
    model = learn(
        env_id="Pendulum-v1",
        network="mlp",
        total_timesteps=60_000,
        seed=0,
        num_envs=4,
        noise_type="ou_0.2",
        actor_lr=1e-3,
        critic_lr=1e-3,
        log_interval=0,
    )
    venv = build_env("Pendulum-v1", 8, normalize=False)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=400)
    assert ret > -400, f"ddpg pendulum return {ret} (random ~-1200, solved ~-200)"


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(noise_type="normal_0.1"),
        dict(noise_type="ou_0.1,normal_0.1"),
        dict(normalize_returns=True),  # popart
        dict(noise_type="adaptive-param_0.2,normal_0.1"),
    ],
)
def test_ddpg_smoke_configs(kwargs):
    """ddpg/test_smoke.py analog: every noise/popart config compiles and
    runs a few cycles."""
    learn(
        env_id="Pendulum-v1",
        network="mlp",
        total_timesteps=2_000,
        seed=0,
        num_envs=2,
        nb_rollout_steps=50,
        nb_train_steps=10,
        log_interval=0,
        **kwargs,
    )
