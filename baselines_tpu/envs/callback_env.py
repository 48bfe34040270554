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


def _downcast_space(space):
    """jax default is 32-bit; downcast 64-bit host obs (mujoco float64)."""
    from baselines_tpu.envs.spaces import Box, DictSpace

    if isinstance(space, DictSpace):
        return DictSpace({k: _downcast_space(s) for k, s in space.spaces.items()})
    if space.shape is not None and np.dtype(space.dtype).itemsize == 8:
        return Box(
            space.low.astype(np.float32),
            space.high.astype(np.float32),
            space.shape,
            np.float32,
        )
    return space


class CallbackVecEnv:
    def __init__(self, host_env: HostVecEnv, info_keys: tuple = ()):
        """info_keys: per-env scalar info fields (e.g. 'is_success' on goal
        envs) surfaced as float32 arrays in the traced step info dict."""
        from baselines_tpu.envs.spaces import DictSpace

        self.host = host_env
        self.num_envs = host_env.num_envs
        self.observation_space = _downcast_space(host_env.observation_space)
        self.action_space = host_env.action_space
        self.info_keys = tuple(info_keys)
        n = self.num_envs
        if isinstance(self.observation_space, DictSpace):
            self._obs_sds = {
                k: jax.ShapeDtypeStruct((n,) + s.shape, s.dtype)
                for k, s in self.observation_space.spaces.items()
            }
        else:
            self._obs_sds = jax.ShapeDtypeStruct(
                (n,) + self.observation_space.shape, self.observation_space.dtype
            )
        # host-side episode stats mirror (reward clip/scale-free)
        self._last_infos = []

    def _cast_obs(self, obs):
        return jax.tree_util.tree_map(
            lambda sds, o: np.asarray(o, sds.dtype), self._obs_sds, obs
        )

    # -- host-side impls ---------------------------------------------------
    def _host_reset(self, seed):
        obs = self.host.reset(int(np.asarray(seed)))
        return self._cast_obs(obs)

    def _format_results(self, results):
        obs, rew, done, infos = results
        terminal_obs = jax.tree_util.tree_map(np.array, obs)
        for i, info in enumerate(infos):
            if "terminal_observation" in info:
                tobs = info["terminal_observation"]
                if isinstance(terminal_obs, dict):
                    for k in terminal_obs:
                        terminal_obs[k][i] = tobs[k]
                else:
                    terminal_obs[i] = tobs
        self._last_infos = infos
        extra = tuple(
            np.asarray([float(info.get(k, 0.0)) for info in infos], np.float32)
            for k in self.info_keys
        )
        return (
            self._cast_obs(obs),
            np.asarray(rew, np.float32),
            np.asarray(done, bool),
            self._cast_obs(terminal_obs),
        ) + extra

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
        ) + tuple(
            jax.ShapeDtypeStruct((self.num_envs,), jnp.float32)
            for _ in self.info_keys
        )

    # -- functional interface ---------------------------------------------
    def reset(self, key):
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        obs = jax.experimental.io_callback(
            self._host_reset, self._obs_sds, seed, ordered=True
        )
        return obs, jnp.zeros((), jnp.int32)

    def step(self, key, state, actions):
        obs, rew, done, terminal_obs, *extra = jax.experimental.io_callback(
            self._host_step, self.step_result_sds, actions, ordered=True
        )
        info = {"terminal_obs": terminal_obs}
        info.update(zip(self.info_keys, extra))
        return obs, state + 1, rew, done, info

    def close(self):
        self.host.close()
