"""Overlapped host-env bridge (envs/host_pipeline.py) — correctness of the
antiphase env-group pipeline vs the plain fused bridge, transition
alignment under auto-reset, structural overlap (submit/collect
interleaving), and the exact branched-statistics merge.

Reference analog: the step_async/step_wait split of
subproc_vec_env.py:75-88, plus SURVEY §7.4's actor/learner-overlap
requirement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baselines_tpu.algos.common import (
    Trajectory,
    init_pipe_state,
    run_rollout,
    run_rollout_pipelined,
)
from baselines_tpu.core.running_stats import RunningMeanStd, merge_branched
from baselines_tpu.envs.callback_env import CallbackVecEnv
from baselines_tpu.envs.gym_bridge import HostVecEnv
from baselines_tpu.envs.host_pipeline import PipelinedHostVecPair
from baselines_tpu.envs.spaces import Box
from baselines_tpu.envs.vec import VecMonitor


class CountingHost(HostVecEnv):
    """Deterministic fixture: counter += action + 1 per step; reward = new
    counter value; episode ends when the counter reaches `limit` (auto-reset
    to 0, terminal obs surfaced like the subproc workers)."""

    def __init__(self, n, limit=7.0, log=None, name=""):
        self.num_envs = n
        self.observation_space = Box(
            np.full((1,), -np.inf, np.float32), np.full((1,), np.inf, np.float32)
        )
        self.action_space = Box(
            np.full((1,), -10.0, np.float32), np.full((1,), 10.0, np.float32)
        )
        self._c = np.zeros((n, 1), np.float32)
        self.limit = float(limit)
        self.log = log if log is not None else []
        self.name = name
        self._pending = None

    def reset(self, seed=None):
        self._c[:] = 0.0
        return self._c.copy()

    def step_async(self, actions):
        self.log.append(("submit", self.name))
        self._pending = np.asarray(actions, np.float32).reshape(self.num_envs, 1)

    def step_wait(self):
        self.log.append(("collect", self.name))
        self._c = self._c + self._pending + 1.0
        rew = self._c[:, 0].copy()
        done = self._c[:, 0] >= self.limit
        infos = []
        obs = self._c.copy()
        for i in range(self.num_envs):
            info = {}
            if done[i]:
                info["terminal_observation"] = obs[i].copy()
                self._c[i] = 0.0
                obs[i] = 0.0
            infos.append(info)
        return obs, rew.astype(np.float32), done, infos

    def step(self, actions):
        self.step_async(actions)
        return self.step_wait()


class StubPolicy:
    """Deterministic traceable policy: action/value/neglogp are pure
    functions of obs, so fused and pipelined rollouts must agree exactly."""

    is_recurrent = False

    def step(self, params, key, obs, rnn_state=None, mask=None):
        action = jnp.mod(obs, 2.0) * 0.25  # in [0, 0.5)
        value = obs[..., 0] * 0.1
        neglogp = obs[..., 0] * 0.01 + 1.0
        return action, value, neglogp, rnn_state

    def value(self, params, obs, rnn_state=None, mask=None):
        return obs[..., 0] * 0.1

    def initial_state(self, n):
        return None


def _chain(host):
    return VecMonitor(CallbackVecEnv(host))


def _expected_columns(nsteps, limit=7.0):
    """Replay the counting dynamics + stub policy in numpy."""
    c = 0.0
    obs, acts, rews, dones = [], [], [], []
    for _ in range(nsteps):
        a = (c % 2.0) * 0.25
        obs.append(c)
        acts.append(a)
        c = c + a + 1.0
        rews.append(c)
        d = c >= limit
        dones.append(d)
        if d:
            c = 0.0
    return map(np.asarray, (obs, acts, rews, dones))


def test_pipelined_transitions_align():
    T = 12
    pair = PipelinedHostVecPair(_chain(CountingHost(2)), _chain(CountingHost(2)))
    policy = StubPolicy()
    key = jax.random.PRNGKey(0)
    ps = init_pipe_state(
        policy, pair, None, key,
        pair.a.reset(jax.random.PRNGKey(1)), pair.b.reset(jax.random.PRNGKey(2)),
    )
    _, ps, traj, last_value = run_rollout_pipelined(policy, pair, None, key, ps, T)

    e_obs, e_act, e_rew, e_done = _expected_columns(T)
    for col in range(4):  # 2 envs in A, 2 in B — all identical dynamics
        np.testing.assert_allclose(np.asarray(traj.obs[:, col, 0]), e_obs, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(traj.actions[:, col, 0]), e_act, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(traj.rewards[:, col]), e_rew, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(traj.dones[:, col]), e_done)
    # bootstrap values correspond to the obs AFTER the last emitted transition
    next_obs = np.where(e_done[-1], 0.0, e_obs[-1] + e_act[-1] + 1.0)
    np.testing.assert_allclose(np.asarray(last_value), np.full(4, next_obs * 0.1), rtol=1e-6)


def test_pipelined_equals_fused():
    T = 10
    policy = StubPolicy()
    key = jax.random.PRNGKey(0)

    fused = _chain(CountingHost(2))
    obs, env_state = fused.reset(jax.random.PRNGKey(1))
    _, _, _, _, _, traj_f, last_v_f = run_rollout(
        policy, fused, None, key, env_state, obs, None,
        jnp.zeros((2,), bool), T,
    )

    pair = PipelinedHostVecPair(_chain(CountingHost(1)), _chain(CountingHost(1)))
    ps = init_pipe_state(
        policy, pair, None, key,
        pair.a.reset(jax.random.PRNGKey(1)), pair.b.reset(jax.random.PRNGKey(2)),
    )
    _, ps, traj_p, last_v_p = run_rollout_pipelined(policy, pair, None, key, ps, T)

    for f, p in zip(jax.tree_util.tree_leaves(traj_f), jax.tree_util.tree_leaves(traj_p)):
        np.testing.assert_allclose(np.asarray(f), np.asarray(p), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(last_v_f), np.asarray(last_v_p), rtol=1e-6)


def test_pipelined_overlap_interleaving():
    """While group A steps on the host, group B must be collected and B's
    next actions submitted BEFORE A is collected — the antiphase schedule
    that lets env time hide device compute."""
    T = 6
    log = []
    pair = PipelinedHostVecPair(
        _chain(CountingHost(1, log=log, name="A")),
        _chain(CountingHost(1, log=log, name="B")),
    )
    policy = StubPolicy()
    key = jax.random.PRNGKey(0)
    ps = init_pipe_state(
        policy, pair, None, key,
        pair.a.reset(jax.random.PRNGKey(1)), pair.b.reset(jax.random.PRNGKey(2)),
    )
    log.clear()
    run_rollout_pipelined(policy, pair, None, key, ps, T)
    # each scan body: submit A, collect B, submit B, collect A
    body = [("submit", "A"), ("collect", "B"), ("submit", "B"), ("collect", "A")]
    assert log == body * T, log[:8]


def test_merge_branched_exact():
    rng = np.random.default_rng(0)
    base, da, db = rng.normal(size=(40, 3)), rng.normal(1.0, 2.0, (25, 3)), rng.normal(-2.0, 0.5, (31, 3))
    prev = RunningMeanStd.create((3,)).update(base)
    a = prev.update(da)
    b = prev.update(db)
    merged = merge_branched(prev, a, b)
    direct = prev.update(da).update(db)
    np.testing.assert_allclose(np.asarray(merged.mean), np.asarray(direct.mean), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(merged.count), np.asarray(direct.count), rtol=1e-6)
    # variance agrees with the full-sample statistics
    allx = np.concatenate([base, da, db])
    np.testing.assert_allclose(np.asarray(merged.var), allx.var(axis=0), rtol=1e-2)


def test_pipelined_ppo_learns_native_cartpole():
    """End-to-end: auto-pipelined PPO on the native C++ engine (its
    step_async runs the batch on a GIL-releasing worker thread)."""
    pytest.importorskip("ctypes")
    from baselines_tpu import native

    try:
        native._load()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native engine unavailable: {e}")
    from baselines_tpu.algos.ppo.ppo import learn
    from baselines_tpu.algos.common import build_env, evaluate
    from baselines_tpu.core import logger

    logger.configure(format_strs=[])
    model = learn(
        env_id="native:CartPole-v1", network="mlp", seed=0, num_envs=8,
        nsteps=64, nminibatches=4, noptepochs=4, lr=1e-3,
        total_timesteps=61440, log_interval=1000,
    )
    assert isinstance(model.state.env_state.__class__.__name__, str)
    venv = build_env("native:CartPole-v1", 4)
    ret, _, episodes = evaluate(model, venv, jax.random.PRNGKey(0), nsteps=500)
    venv.close()
    assert episodes > 0 and ret >= 150, (ret, episodes)
