"""HER learning test (reference: test_fetchreach.py:20-40 — her reaches
FetchReach success; here the pure-JAX PointReach goal env)."""

import jax
import pytest

from baselines_tpu.algos.her.her import learn
from baselines_tpu.core import logger
from baselines_tpu.envs.registry import make_env


@pytest.fixture(autouse=True)
def quiet_logger():
    logger.configure(format_strs=[])
    yield
    logger.reset()


def test_her_point_reach():
    model = learn(
        env_id="PointReach-v0",
        network="mlp",
        total_timesteps=200_000,
        seed=0,
        num_envs=16,
        n_cycles=10,
        n_batches=40,
        batch_size=256,
        log_interval=0,
    )
    env = make_env("PointReach-v0").env  # unwrap TimeLimit
    reset_v = jax.vmap(env.reset)
    step_v = jax.vmap(env.step)
    key = jax.random.PRNGKey(5)
    obs, st = reset_v(jax.random.split(key, 64))
    info = None
    for t in range(50):
        a, _, _ = model.policy.mode_step(model.params, obs)
        obs, st, rew, done, info = step_v(
            jax.random.split(jax.random.fold_in(key, t), 64), st, a
        )
        del rew, done
    success = float(info["is_success"].mean())
    assert success > 0.5, f"her point-reach success rate {success} (random ~0)"
