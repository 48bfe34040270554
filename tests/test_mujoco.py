"""End-to-end MuJoCo tests over the host-env bridge.

The reference's mujoco path (run.py:116: VecNormalize; cmd_util.py:108-122)
is exercised here with real `mujoco` physics: PPO and DDPG short runs on
HalfCheetah-v4 through HostVecEnv → CallbackVecEnv → jitted rollout,
including the float64→float32 obs downcast and observation/return
normalization as device state.
"""

import numpy as np
import pytest

pytest.importorskip("mujoco")
pytest.importorskip("gymnasium")

from baselines_tpu.core import logger  # noqa: E402


@pytest.fixture(autouse=True)
def quiet_logger():
    logger.configure(format_strs=[])
    yield
    logger.reset()


def test_ppo_halfcheetah_smoke():
    from baselines_tpu.run import main

    model = main(
        [
            "--alg=ppo2",
            "--env=HalfCheetah-v4",
            "--num_timesteps=512",
            "--nsteps=64",
            "--num_env=2",
            "--nminibatches=2",
            "--noptepochs=2",
            "--log_interval=1000",
        ]
    )
    assert model is not None
    # act on a fresh host obs (float64→float32 downcast path)
    import gymnasium as gym
    import jax

    env = gym.make("HalfCheetah-v4")
    obs, _ = env.reset(seed=0)
    action, value, neglogp, _ = model.step(
        jax.random.PRNGKey(0), np.asarray(obs, np.float32)[None]
    )
    assert np.asarray(action).shape == (1,) + env.action_space.shape
    assert np.all(np.isfinite(np.asarray(action)))
    assert np.isfinite(float(np.asarray(value).squeeze()))
    env.close()


def test_ddpg_halfcheetah_smoke():
    from baselines_tpu.run import main

    model = main(
        [
            "--alg=ddpg",
            "--env=HalfCheetah-v4",
            "--num_timesteps=600",
            "--num_env=2",
            "--nb_rollout_steps=25",
            "--batch_size=32",
            "--nb_train_steps=5",
            "--nb_epoch_cycles=4",
            "--log_interval=1000",
        ]
    )
    assert model is not None
