"""Native C++ env engine tests: physics equivalence against the pure-JAX
envs (which themselves mirror gymnasium), auto-reset semantics, and the
io_callback bridge + learning path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baselines_tpu import native
from baselines_tpu.envs.registry import make_env

if not native.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def _jax_rollout(env_id, phys_state, actions):
    """Step the pure-JAX env from a given physics state through an action
    sequence (no reset, no time limit), returning per-step (obs, rew, done)."""
    env = make_env(env_id).unwrapped  # strip TimeLimit
    obs_l, rew_l, done_l = [], [], []
    # build the env's state dataclass from the flat physics vector
    _, proto = env.reset(jax.random.PRNGKey(0))
    leaves, treedef = jax.tree_util.tree_flatten(proto)
    flat = list(np.asarray(phys_state, np.float64))
    rebuilt, k = [], 0
    for leaf in leaves:
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        vals = np.asarray(flat[k : k + n], np.float32).reshape(leaf.shape)
        rebuilt.append(jnp.asarray(vals, leaf.dtype))
        k += n
    state = jax.tree_util.tree_unflatten(treedef, rebuilt)
    key = jax.random.PRNGKey(0)
    for a in actions:
        obs, state, rew, done, _ = env.step(key, state, jnp.asarray(a))
        obs_l.append(np.asarray(obs))
        rew_l.append(float(rew))
        done_l.append(bool(done))
    return np.stack(obs_l), np.asarray(rew_l), np.asarray(done_l)


@pytest.mark.parametrize(
    "env_id,n_steps",
    [
        ("CartPole-v1", 30),
        ("Pendulum-v1", 50),
        ("MountainCar-v0", 50),
        ("MountainCarContinuous-v0", 50),
        ("Acrobot-v1", 40),
    ],
)
def test_native_matches_jax_physics(env_id, n_steps):
    venv = native.NativeVecEnv(env_id, num_envs=3, seed=11)
    venv.reset(seed=11)
    phys0 = venv.get_state()

    rng = np.random.RandomState(0)
    from baselines_tpu.envs.spaces import Discrete

    if isinstance(venv.action_space, Discrete):
        actions = rng.randint(0, venv.action_space.n, size=(n_steps, 3)).astype(np.float32)
    else:
        actions = rng.uniform(-1.0, 1.0, size=(n_steps, 3, 1)).astype(np.float32)

    obs_n, rew_n, done_n = [], [], []
    for t in range(n_steps):
        o, r, d, infos = venv.step(actions[t])
        # compare pre-reset obs (physics), so use terminal obs when done
        o = o.copy()
        for i in range(3):
            if d[i]:
                o[i] = infos[i]["terminal_observation"]
        obs_n.append(o)
        rew_n.append(r)
        done_n.append(d)
    obs_n = np.stack(obs_n)
    rew_n = np.stack(rew_n)
    venv.close()

    for i in range(3):
        obs_j, rew_j, done_j = _jax_rollout(env_id, phys0[i], actions[:, i])
        # stop comparing this env at its first termination (native auto-resets)
        done_idx = np.where(np.stack(done_n)[:, i])[0]
        stop = int(done_idx[0]) + 1 if len(done_idx) else n_steps
        np.testing.assert_allclose(obs_n[:stop, i], obs_j[:stop], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(rew_n[:stop, i], rew_j[:stop], rtol=1e-4, atol=1e-4)


def test_native_autoreset_and_timelimit():
    venv = native.NativeVecEnv("CartPole-v0", num_envs=2, seed=3)
    obs = venv.reset(seed=3)
    assert obs.shape == (2, 4) and np.all(np.abs(obs) <= 0.05)
    steps_to_done = 0
    for _ in range(300):
        obs, rew, done, infos = venv.step(np.ones((2, 1), np.float32))
        steps_to_done += 1
        if done.any():
            i = int(np.where(done)[0][0])
            assert "terminal_observation" in infos[i]
            # post-done obs is a fresh reset obs
            assert np.all(np.abs(obs[i]) <= 0.05)
            break
    assert steps_to_done <= 200  # pushing right always terminates fast
    venv.close()


def test_native_reseed_determinism():
    v = native.NativeVecEnv("Pendulum-v1", num_envs=4, seed=5)
    o1 = v.reset(seed=42)
    o2 = v.reset(seed=42)
    np.testing.assert_array_equal(o1, o2)
    o3 = v.reset(seed=43)
    assert not np.allclose(o1, o3)
    v.close()


def test_native_through_callback_bridge_learns():
    """PPO on the native CartPole through CallbackVecEnv reaches the
    test_cartpole.py:16-42 reward threshold."""
    from baselines_tpu.algos.ppo import ppo
    from baselines_tpu.core import logger
    from baselines_tpu.envs.callback_env import CallbackVecEnv
    from baselines_tpu.envs.vec import VecMonitor

    logger.configure(format_strs=[])
    venv = VecMonitor(CallbackVecEnv(native.NativeVecEnv("CartPole-v1", 8, seed=0)))
    model = ppo.learn(
        env=venv,
        seed=0,
        total_timesteps=40_000,
        network="mlp",
        nsteps=128,
        nminibatches=4,
        noptepochs=4,
        lr=3e-4,
        log_interval=10_000,
    )
    from baselines_tpu.algos.common import evaluate

    venv2 = VecMonitor(CallbackVecEnv(native.NativeVecEnv("CartPole-v1", 4, seed=1)))
    mean_ret, _, episodes = evaluate(model, venv2, jax.random.PRNGKey(0), nsteps=600)
    venv2.close()
    venv.close()
    assert episodes > 0 and mean_ret >= 150, (mean_ret, episodes)
