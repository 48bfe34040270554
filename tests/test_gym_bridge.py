"""Host-env bridge tests (reference: common/vec_env/test_vec_env.py:14-105 —
Subproc ≡ Dummy on deterministic rollouts, incl in_series; plus the
io_callback bridge driving a jitted rollout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

from baselines_tpu.envs.callback_env import CallbackVecEnv  # noqa: E402
from baselines_tpu.envs.gym_bridge import (  # noqa: E402
    HostDummyVecEnv,
    HostShmemVecEnv,
    HostSubprocVecEnv,
)
from baselines_tpu.envs.vec import VecMonitor  # noqa: E402


def _thunk():
    return gym.make("CartPole-v1")


def _run(venv, seed, steps=50):
    obs = venv.reset(seed)
    rng = np.random.RandomState(0)
    all_obs, all_rews, all_dones = [obs], [], []
    for _ in range(steps):
        actions = rng.randint(0, 2, size=venv.num_envs)
        obs, rew, done, infos = venv.step(actions)
        all_obs.append(obs)
        all_rews.append(rew)
        all_dones.append(done)
    venv.close()
    return np.stack(all_obs), np.stack(all_rews), np.stack(all_dones)


@pytest.mark.parametrize("klass_kwargs", [
    (HostSubprocVecEnv, {}),
    (HostSubprocVecEnv, {"in_series": 2}),
    (HostShmemVecEnv, {}),
])
def test_parallel_matches_dummy(klass_kwargs):
    klass, kwargs = klass_kwargs
    o1, r1, d1 = _run(HostDummyVecEnv([_thunk] * 4), seed=7)
    o2, r2, d2 = _run(klass([_thunk] * 4, **kwargs), seed=7)
    assert np.allclose(o1, o2)
    assert np.allclose(r1, r2)
    assert np.array_equal(d1, d2)


def test_callback_env_in_jitted_scan():
    venv = VecMonitor(CallbackVecEnv(HostDummyVecEnv([_thunk] * 3)))
    key = jax.random.PRNGKey(0)
    obs, state = venv.reset(key)
    assert obs.shape == (3, 4)

    @jax.jit
    def roll(key, state, obs):
        def body(carry, _):
            key, state, obs = carry
            key, ka, ks = jax.random.split(key, 3)
            actions = jax.random.randint(ka, (3,), 0, 2)
            obs, state, rew, done, info = venv.step(ks, state, actions)
            return (key, state, obs), rew

        (key, state, obs), rews = jax.lax.scan(body, (key, state, obs), None, length=60)
        return state, rews

    state, rews = roll(key, state, obs)
    stats = VecMonitor.get_stats(state)
    assert int(stats.episodes) > 0  # random cartpole episodes completed
    assert 5 < float(stats.mean_length) < 60
    venv.venv.close()
