"""Expert dataset — parity with baselines/gail/dataset/mujoco_dset.py:
loads (obs, acs) trajectories from an .npz (or in-memory arrays), flattens,
and serves shuffled minibatches.  Device-resident: batches are gathered from
HBM arrays with random indices inside jit."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class ExpertDataset:
    def __init__(self, obs=None, acs=None, expert_path: str | None = None,
                 traj_limitation: int = -1):
        if expert_path is not None:
            data = np.load(expert_path, allow_pickle=True)
            obs, acs = data["obs"], data["acs"]
            if traj_limitation > 0:
                obs, acs = obs[:traj_limitation], acs[:traj_limitation]
            obs = obs.reshape((-1,) + obs.shape[2:]) if obs.ndim > 2 else obs
            acs = acs.reshape((-1,) + acs.shape[2:]) if acs.ndim > 2 else acs
        assert obs is not None and acs is not None
        self.obs = jnp.asarray(obs)
        self.acs = jnp.asarray(acs)
        self.n = self.obs.shape[0]

    def sample(self, key, batch_size: int):
        idx = jax.random.randint(key, (batch_size,), 0, self.n)
        return self.obs[idx], self.acs[idx]


def collect_expert(model, venv, key, nsteps: int = 1000):
    """Roll a trained model deterministically and record (obs, acs) — the
    helper the reference gets from run_mujoco/expert npz files."""
    policy = model.policy

    @jax.jit
    def run(key):
        obs, env_state = venv.reset(key)
        rnn = policy.initial_state(venv.num_envs)
        done = jnp.zeros((venv.num_envs,), bool)

        def body(carry, _):
            key, env_state, obs, rnn, done = carry
            key, kstep = jax.random.split(key)
            a, _, rnn2 = policy.mode_step(model.params, obs, rnn, done.astype(jnp.float32))
            nobs, nstate, rew, ndone, _ = venv.step(kstep, env_state, a)
            return (key, nstate, nobs, rnn2, ndone), (obs, a)

        _, (obs_t, acs_t) = jax.lax.scan(
            body, (key, env_state, obs, rnn, done), None, length=nsteps
        )
        return obs_t, acs_t

    obs_t, acs_t = run(key)
    obs = obs_t.reshape((-1,) + obs_t.shape[2:])
    acs = acs_t.reshape((-1,) + acs_t.shape[2:])
    return ExpertDataset(obs=obs, acs=acs)
