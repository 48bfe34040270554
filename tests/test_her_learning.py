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


def test_her_with_demonstrations():
    """BC-loss + Q-filter demo path (her/ddpg.py:361-377): scripted demos
    accelerate early learning."""
    import jax.numpy as jnp

    from baselines_tpu.envs.goal.point_reach import PointReach

    env = PointReach()
    T, E = 50, 32
    key = jax.random.PRNGKey(0)
    reset_v, step_v = jax.vmap(env.reset), jax.vmap(env.step)
    obs, st = reset_v(jax.random.split(key, E))
    os_, ags, gs, us = [], [], [], []
    info = None
    for t in range(T):
        o, ag, g = obs["observation"], obs["achieved_goal"], obs["desired_goal"]
        u = jnp.clip((g - o) / 0.1, -1, 1)  # scripted straight-line expert
        os_.append(o)
        ags.append(ag)
        gs.append(g)
        us.append(u)
        obs, st, rew, done, info = step_v(
            jax.random.split(jax.random.fold_in(key, t), E), st, u
        )
    os_.append(obs["observation"])
    ags.append(obs["achieved_goal"])
    demo = (jnp.stack(os_, 1), jnp.stack(ags, 1), jnp.stack(gs, 1), jnp.stack(us, 1))
    assert float(info["is_success"].mean()) == 1.0  # expert demos are perfect

    model = learn(
        env_id="PointReach-v0",
        network="mlp",
        total_timesteps=40_000,
        seed=0,
        num_envs=16,
        n_cycles=10,
        n_batches=40,
        batch_size=256,
        log_interval=0,
        bc_loss=True,
        q_filter=True,
        demo_episodes=demo,
    )
    assert float(model.state.success_rate) > 0.3
