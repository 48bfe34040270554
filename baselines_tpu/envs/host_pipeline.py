"""Overlapped (double-buffered) host-env bridge.

The reference hides env latency behind worker subprocesses with a
step_async/step_wait split (subproc_vec_env.py:75-88), but its runner is
still serial: model.step, then env.step (ppo2/runner.py:29-40).  Here the
env batch is split into two groups stepped in ANTIPHASE: while group A's
envs step on the host, the device computes group B's actions, and vice
versa.  Each phase is ONE ordered io_callback that simultaneously submits
one group's actions (step_async) and collects the other group's results
(step_wait) — so the callback count per env-step stays at the single-group
bridge's rate while host env time and device policy time overlap instead of
adding up.  Semantics are on-policy WITHIN a rollout: every action is
computed from its group's current observation; group B's transitions simply
materialize one scan phase later.  Across a PPO parameter-update boundary,
the single in-flight group-B transition carried over was acted/valued with
the PREVIOUS iteration's params — one transition per group-B env per
rollout.  The stored neglogp still matches the behavior policy, so the PPO
ratio stays a correct importance weight; only that row's GAE value
bootstrap is one update stale.  ppo.learn auto-enables pipelining for host
envs — pass ``pipeline=False`` for strict serial ppo2 parity.

Works with any host pool exposing step_async/step_wait (HostSubprocVecEnv,
HostShmemVecEnv, the native C++ engine's GIL-releasing thread split) and
with the full functional wrapper chain: wrappers are pure post-transforms
(VecWrapper.post), replayed on the collect leg via `collect_through`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from baselines_tpu.envs.callback_env import CallbackVecEnv
from baselines_tpu.envs.vec import VecMonitor, VecWrapper


def base_callback_env(venv) -> CallbackVecEnv:
    """Peel the wrapper chain down to the CallbackVecEnv."""
    v = venv
    while isinstance(v, VecWrapper):
        v = v.venv
    assert isinstance(v, CallbackVecEnv), f"pipelining needs a host-backed env, got {type(v)}"
    return v


def collect_through(venv, state, base_results):
    """Apply the wrapper chain's post-transforms to one collected base step
    (the collect half of VecWrapper.step)."""
    if isinstance(venv, VecWrapper):
        obs, inner, rew, done, info = collect_through(
            venv.venv, venv.unwrap_state(state), base_results
        )
        return venv.post(state, obs, inner, rew, done, info)
    # base CallbackVecEnv: results already formatted; advance its counter
    obs, rew, done, terminal_obs = base_results
    return obs, state + 1, rew, done, {"terminal_obs": terminal_obs}


@struct.dataclass
class PipeState:
    """Carried state of a pipelined rollout (group B always has one step in
    flight between updates)."""

    state_a: Any
    state_b: Any
    obs_a: Any  # group A's current obs (A idle)
    pend_obs_b: Any  # origin obs of B's in-flight step
    pend_act_b: Any
    pend_val_b: Any
    pend_nlp_b: Any
    # done flags of the groups' last COMPLETED steps; for B this is also the
    # rnn-mask lineage of the pending transition (mask at step t = done at
    # t-1, a2c/utils.py:88-91)
    last_done_a: jnp.ndarray
    last_done_b: jnp.ndarray


class PipelinedHostVecPair:
    """Two host-backed functional env chains stepped in antiphase."""

    def __init__(self, venv_a, venv_b):
        assert venv_a.num_envs == venv_b.num_envs, "groups must be equal-sized"
        self.a = venv_a
        self.b = venv_b
        self.base_a = base_callback_env(venv_a)
        self.base_b = base_callback_env(venv_b)
        self.num_envs = venv_a.num_envs + venv_b.num_envs
        self.observation_space = venv_a.observation_space
        self.action_space = venv_a.action_space

    # -- host-side fused phases ---------------------------------------------
    def _h_submit_b(self, actions):
        return self.base_b._host_submit(actions)

    def _h_swap_ab(self, actions_a):
        """Submit group A's step, then block for group B's in-flight result —
        A's envs step while the caller's next device compute runs."""
        self.base_a._host_submit(actions_a)
        return self.base_b._host_collect()

    def _h_swap_ba(self, actions_b):
        self.base_b._host_submit(actions_b)
        return self.base_a._host_collect()

    # -- traced ops -----------------------------------------------------------
    def submit_b(self, actions):
        return jax.experimental.io_callback(
            self._h_submit_b, jax.ShapeDtypeStruct((), jnp.int32), actions,
            ordered=True,
        )

    def swap_ab(self, actions_a):
        return jax.experimental.io_callback(
            self._h_swap_ab, self.base_b.step_result_sds, actions_a, ordered=True
        )

    def swap_ba(self, actions_b):
        return jax.experimental.io_callback(
            self._h_swap_ba, self.base_a.step_result_sds, actions_b, ordered=True
        )

    # -- logging / cleanup -----------------------------------------------------
    @staticmethod
    def get_stats(pipe_state: PipeState):
        """Episode stats of both groups merged (episode-count weighted)."""
        sa = VecMonitor.get_stats(pipe_state.state_a)
        sb = VecMonitor.get_stats(pipe_state.state_b)
        return sa.merge(sb)

    def close(self):
        for v in (self.a, self.b):
            close = getattr(v, "close", None)
            if close is not None:
                close()
