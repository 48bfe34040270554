"""Serialization / coexistence contracts — analog of the reference's
common/tests/test_serialization.py:33-117: a save→load round trip through a
fresh `learn(total_timesteps=0, load_path=...)` must reproduce the policy's
outputs exactly, and `total_timesteps=0` must mean *no* training (the
run.py:218-244 `--num_timesteps=0 --load_path --play` contract); two models
must coexist in one process (test_coexistence :85-117 — trivially true
without a global graph, asserted anyway).
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baselines_tpu.algos.common import build_env
from baselines_tpu.core import logger


@pytest.fixture(autouse=True)
def quiet_logger():
    logger.configure(format_strs=[])
    yield
    logger.reset()


# alg -> (env_id, tiny-but-nonzero training kwargs)
CASES = {
    "ppo": ("DiscreteIdentity-v0", dict(num_envs=4, nsteps=16, nminibatches=2,
                                        noptepochs=1, total_timesteps=128)),
    "a2c": ("DiscreteIdentity-v0", dict(num_envs=4, nsteps=8, total_timesteps=64)),
    "acktr": ("DiscreteIdentity-v0", dict(num_envs=4, nsteps=8, total_timesteps=64,
                                          cold_iter=2)),
    "acer": ("DiscreteIdentity-v0", dict(num_envs=4, nsteps=8, total_timesteps=64,
                                         buffer_size=256, replay_start=16,
                                         replay_ratio=0, network="mlp")),
    "trpo": ("DiscreteIdentity-v0", dict(num_envs=4, timesteps_per_batch=64,
                                         total_timesteps=64, cg_iters=3)),
    "dqn": ("DiscreteIdentity-v0", dict(num_envs=2, total_timesteps=128,
                                        learning_starts=32, chunk_size=64,
                                        buffer_size=512, batch_size=16)),
    "ddpg": ("BoxIdentity-v0", dict(num_envs=2, total_timesteps=64,
                                    nb_epoch_cycles=2, nb_rollout_steps=8,
                                    nb_train_steps=2, batch_size=8,
                                    buffer_size=512)),
}


def _learn(alg, env_id, **kwargs):
    from baselines_tpu.algos import get_learn_function

    return get_learn_function(alg)(env_id=env_id,
                                   network=kwargs.pop("network", "mlp"),
                                   seed=0, **kwargs)


def _probe(model, env_id, nenv=4):
    venv = build_env(env_id, nenv)
    obs, _ = venv.reset(jax.random.PRNGKey(7))
    key = jax.random.PRNGKey(3)
    action = model.step(key, obs)[0]
    value = model.value(obs)
    return np.asarray(jax.device_get(action)), np.asarray(jax.device_get(value))


@pytest.mark.parametrize("alg", sorted(CASES))
def test_save_load_roundtrip(alg, tmp_path):
    env_id, kwargs = CASES[alg]
    model = _learn(alg, env_id, **kwargs)
    path = str(tmp_path / f"{alg}.ckpt")
    model.save(path)
    a1, v1 = _probe(model, env_id)

    zero = dict(kwargs)
    zero["total_timesteps"] = 0
    loaded = _learn(alg, env_id, load_path=path, **zero)
    a2, v2 = _probe(loaded, env_id)

    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)

    # loaded params identical leaf-for-leaf (=> total_timesteps=0 trained nothing)
    for l1, l2 in zip(jax.tree_util.tree_leaves(model.params),
                      jax.tree_util.tree_leaves(loaded.params)):
        np.testing.assert_array_equal(jax.device_get(l1), jax.device_get(l2))


def test_serialization_cnn_policy(tmp_path):
    """CNN variant of the round trip (reference parametrizes across networks)."""
    from baselines_tpu.algos.ppo.ppo import learn

    model = learn(env_id="ImageIdentity-v0", network="cnn_small", seed=0,
                  num_envs=2, nsteps=8, nminibatches=2, noptepochs=1,
                  total_timesteps=32)
    path = str(tmp_path / "ppo_cnn.ckpt")
    model.save(path)
    a1, v1 = _probe(model, "ImageIdentity-v0", nenv=2)
    loaded = learn(env_id="ImageIdentity-v0", network="cnn_small", seed=1,
                   num_envs=2, nsteps=8, nminibatches=2, noptepochs=1,
                   total_timesteps=0, load_path=path)
    a2, v2 = _probe(loaded, "ImageIdentity-v0", nenv=2)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)


def test_coexistence(tmp_path):
    """Two independently trained models coexist and stay independent
    (test_serialization.py:85-117)."""
    from baselines_tpu.algos.ppo.ppo import learn as ppo_learn
    from baselines_tpu.algos.a2c.a2c import learn as a2c_learn

    m1 = ppo_learn(env_id="DiscreteIdentity-v0", network="mlp", seed=0,
                   num_envs=4, nsteps=8, nminibatches=2, noptepochs=1,
                   total_timesteps=64)
    m2 = a2c_learn(env_id="DiscreteIdentity-v0", network="mlp", seed=1,
                   num_envs=4, nsteps=8, total_timesteps=64)
    a1, v1 = _probe(m1, "DiscreteIdentity-v0")
    a2, v2 = _probe(m2, "DiscreteIdentity-v0")
    # both stepped fine; their params differ (independent inits/seeds)
    sums1 = float(sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(m1.params)))
    sums2 = float(sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(m2.params)))
    assert sums1 != sums2
    assert v1.shape == v2.shape
