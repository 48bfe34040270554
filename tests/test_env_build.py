"""build_env wrapper-chain contracts added in round 2: --reward_scale
threading (ref cmd_util.py:43 + make_env RewardScaler), VecNormalize
statistics surviving Model.save/--play (ref README.md:117 wart), and the
--save_video_interval/--save_video_length surface (ref run.py:104-108,
cmd_util.py:163-164)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baselines_tpu.algos.common import build_env, evaluate
from baselines_tpu.core import logger
from baselines_tpu.envs.vec import VecMonitor, find_normalize_state


@pytest.fixture(autouse=True)
def quiet_logger():
    logger.configure(format_strs=[])
    yield
    logger.reset()


def _roll(venv, nsteps, seed=0):
    """Jitted random-action rollout; returns summed rewards and final state."""
    from baselines_tpu.envs.spaces import Discrete

    def sample_action(key):
        if isinstance(venv.action_space, Discrete):
            return jax.random.randint(key, (venv.num_envs,), 0, venv.action_space.n)
        shape = (venv.num_envs,) + venv.action_space.shape
        return jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)

    @jax.jit
    def run(key):
        obs, state = venv.reset(key)

        def body(carry, _):
            key, state = carry
            key, ka, ks = jax.random.split(key, 3)
            obs, state, rew, done, _ = venv.step(ks, state, sample_action(ka))
            return (key, state), rew

        (key, state), rews = jax.lax.scan(body, (key, state), None, length=nsteps)
        return rews, state

    return run(jax.random.PRNGKey(seed))


def test_reward_scale_scales_rewards_not_monitor():
    venv = build_env("CartPole-v1", 4, reward_scale=5.0, normalize=False)
    rews, state = _roll(venv, 64)
    # CartPole emits reward 1.0 per step -> 5.0 scaled
    assert np.allclose(np.asarray(rews), 5.0)
    # episode accounting sits INSIDE the scaler: raw units (= episode length)
    stats = VecMonitor.get_stats(state)
    assert int(stats.episodes) > 0
    assert np.isclose(float(stats.mean_return), float(stats.mean_length))


def test_reward_scale_native_branch():
    pytest.importorskip("ctypes")
    try:
        from baselines_tpu import native

        native._load()
    except Exception as e:  # pragma: no cover - toolchain always present in CI
        pytest.skip(f"native engine unavailable: {e}")
    venv = build_env("native:CartPole-v1", 2, reward_scale=3.0)
    rews, state = _roll(venv, 8)
    assert np.allclose(np.asarray(rews), 3.0)
    venv.close()


def test_normalize_stats_survive_save_load(tmp_path):
    from baselines_tpu.algos.ppo.ppo import learn

    kwargs = dict(
        env_id="Pendulum-v1",
        network="mlp",
        seed=0,
        num_envs=4,
        nsteps=32,
        nminibatches=2,
        noptepochs=1,
        env_kwargs={"normalize": True},
    )
    model = learn(total_timesteps=256, **kwargs)
    ns = model._normalize_state()
    assert ns is not None and float(ns.ob_rms.count) > 4

    path = str(tmp_path / "model")
    model.save(path)

    fresh = learn(total_timesteps=0, load_path=path, **kwargs)
    ns2 = fresh._normalize_state()
    assert ns2 is not None
    np.testing.assert_allclose(
        np.asarray(ns.ob_rms.mean), np.asarray(ns2.ob_rms.mean), rtol=1e-6
    )
    np.testing.assert_allclose(float(ns.ob_rms.count), float(ns2.ob_rms.count))

    # same policy outputs on the same (normalized) obs — Pendulum obs is (3,)
    obs = jnp.ones((4, 3), jnp.float32)
    a1, *_ = model.policy.mode_step(model.params, obs)
    a2, *_ = fresh.policy.mode_step(fresh.params, obs)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)


def test_evaluate_injects_trained_normalization():
    """evaluate() must seed a fresh normalized env with the model's trained
    running statistics (the --play path)."""
    from baselines_tpu.algos.ppo.ppo import learn
    from baselines_tpu.envs.vec import VecNormalize

    model = learn(
        env_id="Pendulum-v1", network="mlp", seed=0, num_envs=4, nsteps=32,
        nminibatches=2, noptepochs=1, total_timesteps=256,
        env_kwargs={"normalize": True},
    )
    ns = model._normalize_state()
    venv = build_env("Pendulum-v1", 1, normalize=True)
    evaluate(model, venv, jax.random.PRNGKey(0), nsteps=16)
    w = venv
    while w is not None and not isinstance(w, VecNormalize):
        w = getattr(w, "venv", None)
    assert w is not None and w._init_stats is not None
    np.testing.assert_allclose(
        np.asarray(w._init_stats[0].mean), np.asarray(ns.ob_rms.mean)
    )


def test_legacy_params_only_checkpoint_loads(tmp_path):
    """Pre-round-2 checkpoints stored bare params; Model.load must still
    accept them."""
    from baselines_tpu.algos.ppo.ppo import learn
    from baselines_tpu.core import checkpoint as ckpt

    kwargs = dict(env_id="DiscreteIdentity-v0", network="mlp", seed=0,
                  num_envs=4, nsteps=16, nminibatches=2, noptepochs=1)
    model = learn(total_timesteps=64, **kwargs)
    path = str(tmp_path / "legacy")
    ckpt.save_state(path, model.state.params)  # old format
    fresh = learn(total_timesteps=0, load_path=path, **kwargs)
    # compare a forward pass on the training env's obs space
    venv = build_env("DiscreteIdentity-v0", 4)
    o, _ = venv.reset(jax.random.PRNGKey(1))
    a1, *_ = model.policy.mode_step(model.params, o)
    a2, *_ = fresh.policy.mode_step(fresh.params, o)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))


def test_video_recorder_writes_mp4(tmp_path):
    pytest.importorskip("cv2")
    video_dir = str(tmp_path / "videos")
    venv = build_env(
        "CartPole-v1", 2, normalize=False,
        save_video_interval=32, save_video_length=6, video_dir=video_dir,
    )
    _roll(venv, 40)
    venv.close()
    vids = glob.glob(os.path.join(video_dir, "*.mp4"))
    assert vids, "expected at least one recorded video"
    assert os.path.getsize(vids[0]) > 0


def test_cli_reward_scale_and_video(tmp_path):
    pytest.importorskip("cv2")
    from baselines_tpu.run import main

    video_dir = str(tmp_path)
    model = main([
        "--alg=ppo2", "--env=CartPole-v1", "--num_timesteps=256",
        "--nsteps=32", "--num_env=2", "--log_interval=1000",
        "--reward_scale=0.1", "--save_video_interval=32",
        "--save_video_length=4", f"--log_path={video_dir}",
    ])
    assert model is not None
    assert glob.glob(os.path.join(video_dir, "videos", "*.mp4"))
