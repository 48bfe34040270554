"""CallbackVecEnv — drive host (gymnasium) environments from inside a jitted
rollout scan.

The reference keeps env stepping on the host python side of a sess.run
boundary (ppo2/runner.py:29-40).  Here the boundary is inverted: the jitted
training step owns the loop and calls out to the host env pool through
`jax.experimental.io_callback` (ordered — the pool is stateful).  The
functional interface is identical to VecJaxEnv, so VecMonitor /
VecNormalize / VecFrameStack and every algorithm compose unchanged on host
MuJoCo/Atari workloads.

Auto-reset happens host-side in the workers (subproc semantics,
subproc_vec_env.py:8-12); the pre-reset terminal observation is surfaced as
info['terminal_obs'] like the device engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from baselines_tpu.envs.gym_bridge import HostVecEnv


class CallbackVecEnv:
    def __init__(self, host_env: HostVecEnv):
        self.host = host_env
        self.num_envs = host_env.num_envs
        self.observation_space = host_env.observation_space
        # jax default is 32-bit; downcast 64-bit host obs (mujoco float64)
        if np.dtype(self.observation_space.dtype).itemsize == 8:
            from baselines_tpu.envs.spaces import Box

            self.observation_space = Box(
                self.observation_space.low.astype(np.float32),
                self.observation_space.high.astype(np.float32),
                self.observation_space.shape,
                np.float32,
            )
        self.action_space = host_env.action_space
        self._obs_sds = jax.ShapeDtypeStruct(
            (self.num_envs,) + self.observation_space.shape,
            self.observation_space.dtype,
        )
        # host-side episode stats mirror (reward clip/scale-free)
        self._last_infos = []

    # -- host-side impls ---------------------------------------------------
    def _host_reset(self, seed):
        obs = self.host.reset(int(np.asarray(seed)))
        return np.asarray(obs, self.observation_space.dtype)

    def _format_results(self, results):
        obs, rew, done, infos = results
        terminal_obs = np.array(obs)
        for i, info in enumerate(infos):
            if "terminal_observation" in info:
                terminal_obs[i] = info["terminal_observation"]
        self._last_infos = infos
        return (
            np.asarray(obs, self.observation_space.dtype),
            np.asarray(rew, np.float32),
            np.asarray(done, bool),
            terminal_obs.astype(self.observation_space.dtype),
        )

    def _host_step(self, actions):
        return self._format_results(self.host.step(np.asarray(actions)))

    def _host_submit(self, actions):
        """Dispatch the batch to the pool and return immediately (the
        step_async leg; envs/host_pipeline.py pairs it with another group's
        collect so env time overlaps device compute)."""
        self.host.step_async(np.asarray(actions))
        return np.int32(0)

    def _host_collect(self):
        return self._format_results(self.host.step_wait())

    @property
    def step_result_sds(self):
        """ShapeDtypeStructs of one formatted step result."""
        return (
            self._obs_sds,
            jax.ShapeDtypeStruct((self.num_envs,), jnp.float32),
            jax.ShapeDtypeStruct((self.num_envs,), jnp.bool_),
            self._obs_sds,
        )

    # -- functional interface ---------------------------------------------
    def reset(self, key):
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        obs = jax.experimental.io_callback(
            self._host_reset, self._obs_sds, seed, ordered=True
        )
        return obs, jnp.zeros((), jnp.int32)

    def step(self, key, state, actions):
        obs, rew, done, terminal_obs = jax.experimental.io_callback(
            self._host_step, self.step_result_sds, actions, ordered=True
        )
        return obs, state + 1, rew, done, {"terminal_obs": terminal_obs}

    def close(self):
        self.host.close()
