"""Env layer tests: dynamics sanity, auto-reset semantics, wrapper state
(reference analogs: test_vec_env.py, identity_env_test.py, wrappers)."""

import jax
import jax.numpy as jnp
import numpy as np

from baselines_tpu.envs import VecJaxEnv, make_env
from baselines_tpu.envs.registry import env_names, get_env_type
from baselines_tpu.envs.testing.identity import DiscreteIdentityEnv
from baselines_tpu.envs.vec import (
    EPISODE_BUFFER,
    VecFrameStack,
    VecMonitor,
    VecNormalize,
)


def test_all_registered_envs_step(key):
    for name in env_names():
        env = make_env(name)
        obs, state = env.reset(key)
        k1, k2 = jax.random.split(key)
        action = env.action_space.sample(k1)
        obs2, state2, rew, done, info = env.step(k2, state, action)
        assert jnp.shape(rew) == ()
        assert jnp.shape(done) == ()
        assert get_env_type(name)


def test_cartpole_episode_length(key):
    """Random policy on CartPole lasts ~20 steps on average."""
    venv = VecMonitor(VecJaxEnv(make_env("CartPole-v1"), 16))
    obs, state = venv.reset(key)

    @jax.jit
    def run(key, state, obs):
        def body(carry, _):
            key, state, obs = carry
            key, ka, ks = jax.random.split(key, 3)
            actions = jax.random.randint(ka, (16,), 0, 2)
            obs, state, rew, done, _ = venv.step(ks, state, actions)
            return (key, state, obs), None

        (key, state, obs), _ = jax.lax.scan(body, (key, state, obs), None, length=300)
        return state

    state = run(key, state, obs)
    stats = VecMonitor.get_stats(state)
    assert 8 < float(stats.mean_length) < 60
    assert int(stats.episodes) > 16


def test_auto_reset_gives_reset_obs(key):
    """After done, returned obs must be a fresh-reset obs
    (subproc_vec_env.py:8-12 semantics)."""
    env = DiscreteIdentityEnv(4, episode_len=3)
    venv = VecJaxEnv(env, 2)
    obs, state = venv.reset(key)
    saw_done = False
    for i in range(7):
        k = jax.random.fold_in(key, i)
        actions = jnp.zeros((2,), jnp.int32)
        obs, state, rew, done, info = venv.step(k, state, actions)
        if bool(done.any()):
            saw_done = True
            # after auto-reset the internal step counter must be 0
            assert int(state.t[np.argmax(np.asarray(done))]) == 0
    assert saw_done  # 3-step episodes must have ended within 7 steps


def test_time_limit_truncation(key):
    env = make_env("Pendulum-v1")  # 200-step limit, never terminates
    obs, state = env.reset(key)
    done_at = None
    for t in range(205):
        k = jax.random.fold_in(key, t)
        obs, state, rew, done, info = env.step(k, state, jnp.zeros((1,)))
        if bool(done):
            done_at = t + 1
            assert bool(info["truncated"])
            break
    assert done_at == 200


def test_frame_stack(key):
    env = make_env("CartPole-v1")
    venv = VecFrameStack(VecJaxEnv(env, 3), 4)
    obs, state = venv.reset(key)
    assert obs.shape == (3, 16)  # 4 obs dims * 4 frames
    # newest frame occupies the last 4 channels; first three stacks zero
    assert np.allclose(np.asarray(obs[:, :12]), 0.0)
    obs2, state, rew, done, _ = venv.step(key, state, jnp.zeros((3,), jnp.int32))
    assert not np.allclose(np.asarray(obs2[:, 8:12]), 0.0)  # shifted in


def test_vec_normalize(key):
    env = make_env("Pendulum-v1")
    venv = VecNormalize(VecMonitor(VecJaxEnv(env, 8)))
    obs, state = venv.reset(key)

    @jax.jit
    def run(key, state, obs):
        def body(carry, _):
            key, state, obs = carry
            key, ka, ks = jax.random.split(key, 3)
            actions = jax.random.uniform(ka, (8, 1), minval=-2, maxval=2)
            obs, state, rew, done, _ = venv.step(ks, state, actions)
            return (key, state, obs), obs

        return jax.lax.scan(body, (key, state, obs), None, length=500)

    (key, state, obs), all_obs = run(key, state, obs)
    flat = np.asarray(all_obs).reshape(-1, 3)
    # normalized obs should be roughly zero-mean unit-ish variance
    assert np.all(np.abs(flat.mean(0)) < 1.0)
    assert np.all(flat.std(0) < 3.0)
    # stats are part of state => they checkpoint with it
    assert float(state.ob_rms.count) > 100


def test_episode_stats_ring_buffer(key):
    env = DiscreteIdentityEnv(2, episode_len=5)
    venv = VecMonitor(VecJaxEnv(env, 4))
    obs, state = venv.reset(key)
    for i in range(60):
        k = jax.random.fold_in(key, i)
        obs, state, rew, done, _ = venv.step(k, state, jnp.zeros((4,), jnp.int32))
    stats = VecMonitor.get_stats(state)
    assert int(stats.episodes) == 4 * 12  # 60 steps / 5-step episodes
    assert 0.0 <= float(stats.mean_return) <= 5.0
    assert float(stats.mean_length) == 5.0
    assert stats.ret_buffer.shape == (EPISODE_BUFFER,)
