"""ACER learning test + retrace golden-value check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baselines_tpu.algos.acer.acer import learn, q_retrace
from baselines_tpu.algos.common import build_env, evaluate
from baselines_tpu.core import logger


@pytest.fixture(autouse=True)
def quiet_logger():
    logger.configure(format_strs=[])
    yield
    logger.reset()


def test_q_retrace_matches_reference():
    """Literal numpy transcription of acer.py:25-51."""
    rng = np.random.RandomState(0)
    T, N = 7, 3
    R = rng.randn(T, N).astype(np.float32)
    D = (rng.rand(T, N) < 0.2).astype(np.float32)
    q_i = rng.randn(T, N).astype(np.float32)
    v = rng.randn(T + 1, N).astype(np.float32)
    rho_i = np.exp(rng.randn(T, N)).astype(np.float32)
    gamma = 0.95

    rho_bar = np.minimum(1.0, rho_i)
    qret = v[-1]
    qrets = np.zeros((T, N), np.float32)
    for i in range(T - 1, -1, -1):
        qret = R[i] + gamma * qret * (1.0 - D[i])
        qrets[i] = qret
        qret = rho_bar[i] * (qret - q_i[i]) + v[i]

    got = np.asarray(
        q_retrace(
            jnp.asarray(R), jnp.asarray(D), jnp.asarray(q_i), jnp.asarray(v),
            jnp.asarray(rho_i), gamma,
        )
    )
    assert np.allclose(got, qrets, atol=1e-5)


def test_acer_cartpole():
    model = learn(
        env_id="CartPole-v1",
        network="mlp",
        total_timesteps=200_000,
        seed=0,
        num_envs=8,
        nsteps=20,
        lr=7e-4,
        replay_start=2000,
        buffer_size=20000,
        log_interval=0,
    )
    venv = build_env("CartPole-v1", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=600)
    assert ret >= 150, f"acer cartpole mean return {ret}"
