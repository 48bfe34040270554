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


def test_frame_chunk_codec_roundtrip():
    """compress/decompress must exactly reproduce VecFrameStack observations
    across episode boundaries (the reference ACER buffer's dedup contract,
    acer/buffer.py:3-156)."""
    import jax.numpy as jnp

    from baselines_tpu.data.frame_chunk import compress_frames, decompress_frames
    from baselines_tpu.envs.registry import make_env
    from baselines_tpu.envs.testing.identity import BoxIdentityEnv
    from baselines_tpu.envs.vec import VecFrameStack, VecJaxEnv

    k, nsteps, nenvs = 4, 37, 3
    venv = VecFrameStack(VecJaxEnv(BoxIdentityEnv((2,), episode_len=5), nenvs), k)
    key = jax.random.PRNGKey(3)
    obs, state = venv.reset(key)

    def step_fn(carry, _):
        key, state, obs = carry
        key, kact, kstep = jax.random.split(key, 3)
        act = jax.random.uniform(kact, (nenvs, 2), minval=-1.0, maxval=1.0)
        nobs, nstate, _, done, _ = venv.step(kstep, state, act)
        return (key, nstate, nobs), (obs, done)

    (key, state, obs), (obs_t, done_t) = jax.lax.scan(
        step_fn, (key, state, obs), None, length=nsteps
    )
    # env-major (N, T+1, ..., k*C) / (N, T)
    full = jnp.concatenate([obs_t, obs[None]], axis=0).swapaxes(0, 1)
    dones = done_t.swapaxes(0, 1).astype(jnp.float32)
    assert jnp.any(dones > 0), "test must cross episode boundaries"

    for env_i in range(nenvs):
        first, frames = compress_frames(full[env_i], dones[env_i], k)
        rebuilt = decompress_frames(first, frames, dones[env_i], k)
        assert rebuilt.shape == full[env_i].shape
        assert jnp.allclose(rebuilt, full[env_i]), (
            f"frame codec mismatch on env {env_i}"
        )
        # and it actually dedups: storage shrinks ~k-fold over the chunk
        assert frames.shape[-1] * k == full.shape[-1]


def test_acer_dedup_replay_learns():
    """ACER with the frame-dedup replay layout still trains (CartPole under
    a 2-frame stack)."""
    from baselines_tpu.envs.registry import make_env
    from baselines_tpu.envs.vec import VecFrameStack, VecJaxEnv, VecMonitor

    venv = VecMonitor(VecFrameStack(VecJaxEnv(make_env("CartPole-v1"), 4), 2))
    model = learn(
        env=venv,
        network="mlp",
        total_timesteps=120_000,
        seed=0,
        nsteps=20,
        replay_start=2_000,
        buffer_size=10_000,
        dedup_frames=2,
        log_interval=0,
    )
    eval_env = VecMonitor(VecFrameStack(VecJaxEnv(make_env("CartPole-v1"), 4), 2))
    ret, _, _ = evaluate(model, eval_env, jax.random.PRNGKey(1), nsteps=600)
    assert ret > 100, f"acer dedup cartpole mean return {ret}"
