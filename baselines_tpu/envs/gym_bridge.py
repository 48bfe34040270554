"""Host environment bridge — gymnasium-backed vector envs with the
reference's VecEnv semantics, plus a jit-compatible adapter.

Parity map:
- `HostDummyVecEnv`  ≙ DummyVecEnv (common/vec_env/dummy_vec_env.py:5-81):
  sequential in-process stepping, auto-reset on done.
- `HostSubprocVecEnv` ≙ SubprocVecEnv (subproc_vec_env.py) incl. `in_series`
  chunking (:44-58): worker processes over pipes, daemonized (:63-64),
  auto-reset inside the worker (:8-12).
- `HostShmemVecEnv`  ≙ ShmemVecEnv (shmem_vec_env.py:20-141): observations
  move through shared memory; the pipe carries only rew/done/info.
- `GymAdapter` folds gymnasium's (terminated, truncated) back into the
  gym-0.x combined done the reference is written against, and applies
  per-env Monitor episode accounting (bench/monitor.py:10-94 semantics,
  surfaced as info['episode'] on done).
- `CallbackVecEnv` exposes any host vec env through the SAME functional
  interface as VecJaxEnv via `jax.experimental.io_callback`, so every
  algorithm's jitted rollout scan drives host MuJoCo/Atari unchanged —
  the TPU-native replacement for the reference's runner-side env.step
  (SURVEY §7.4 host-env bridge).
"""

from __future__ import annotations

import multiprocessing as mp
import time
from typing import Callable, List

import numpy as np

from baselines_tpu.envs.spaces import Box as JBox, Discrete as JDiscrete


def convert_space(space):
    """gymnasium space → our JAX-native space."""
    import gymnasium as gym

    if isinstance(space, gym.spaces.Discrete):
        return JDiscrete(int(space.n))
    if isinstance(space, gym.spaces.Box):
        return JBox(space.low, space.high, space.shape, space.dtype)
    if isinstance(space, gym.spaces.Dict):
        from baselines_tpu.envs.spaces import DictSpace

        return DictSpace({k: convert_space(s) for k, s in space.spaces.items()})
    raise NotImplementedError(f"unsupported host space {space}")


def stack_obs(obs_list):
    """Stack a list of per-env observations, dict-aware (the vec_env
    util.py:11-62 dict-obs handling analog)."""
    if isinstance(obs_list[0], dict):
        return {k: np.stack([o[k] for o in obs_list]) for k in obs_list[0]}
    return np.stack(obs_list)


class GymAdapter:
    """old-API (obs, rew, done, info) view of a gymnasium env + Monitor
    episode accounting."""

    def __init__(self, env):
        self.env = env
        self.observation_space = convert_space(env.observation_space)
        self.action_space = convert_space(env.action_space)
        self._ep_ret = 0.0
        self._ep_len = 0
        self._t0 = time.time()

    def reset(self, seed=None):
        obs, _ = self.env.reset(seed=seed)
        self._ep_ret, self._ep_len = 0.0, 0
        return obs

    def step(self, action):
        obs, rew, terminated, truncated, info = self.env.step(action)
        done = bool(terminated or truncated)
        self._ep_ret += float(rew)
        self._ep_len += 1
        if done:
            # Monitor contract (monitor.py:58-75)
            info = dict(info)
            info["episode"] = {
                "r": self._ep_ret,
                "l": self._ep_len,
                "t": round(time.time() - self._t0, 6),
            }
            if truncated and not terminated:
                info["TimeLimit.truncated"] = True
            info["terminal_observation"] = obs
            obs = self.reset()
        return obs, float(rew), done, info

    def render(self):
        return self.env.render()

    def close(self):
        self.env.close()


class HostVecEnv:
    """Interface: reset(seed)->obs(N,...); step(actions)->(obs,rew,done,infos)."""

    num_envs: int
    observation_space: JBox
    action_space: object

    def reset(self, seed=None):
        raise NotImplementedError

    def step(self, actions):
        raise NotImplementedError

    # -- async split (vec_env.py:29-108 step_async/step_wait contract) --------
    # Subclasses override for real asynchrony; the default degrades to a
    # synchronous step buffered until step_wait.
    _sync_result = None

    def step_async(self, actions):
        self._sync_result = self.step(actions)

    def step_wait(self):
        r, self._sync_result = self._sync_result, None
        return r

    def render(self):
        """Tiled rgb frame of the member envs (VecEnv.render 'rgb_array'
        mode, vec_env.py:110-121); envs must be built with
        render_mode='rgb_array'."""
        raise NotImplementedError

    def close(self):
        pass


class HostDummyVecEnv(HostVecEnv):
    def __init__(self, env_fns: List[Callable]):
        self.envs = [GymAdapter(fn()) for fn in env_fns]
        self.num_envs = len(self.envs)
        self.observation_space = self.envs[0].observation_space
        self.action_space = self.envs[0].action_space

    def reset(self, seed=None):
        return stack_obs(
            [e.reset(None if seed is None else seed + i) for i, e in enumerate(self.envs)]
        )

    def step(self, actions):
        obs, rews, dones, infos = [], [], [], []
        for e, a in zip(self.envs, actions):
            o, r, d, i = e.step(a)
            obs.append(o)
            rews.append(r)
            dones.append(d)
            infos.append(i)
        return (
            stack_obs(obs),
            np.asarray(rews, np.float32),
            np.asarray(dones, bool),
            infos,
        )

    def render(self):
        from baselines_tpu.core.tile_images import tile_images

        return tile_images([e.render() for e in self.envs])

    def close(self):
        for e in self.envs:
            e.close()


def _subproc_worker(remote, parent_remote, env_fn_wrappers):
    """subproc_vec_env.py:7-36 worker loop."""
    parent_remote.close()
    envs = [GymAdapter(fn()) for fn in env_fn_wrappers.x]
    try:
        while True:
            cmd, data = remote.recv()
            if cmd == "step":
                results = [env.step(a) for env, a in zip(envs, data)]
                remote.send(results)
            elif cmd == "reset":
                remote.send(
                    [
                        env.reset(None if data is None else data + j)
                        for j, env in enumerate(envs)
                    ]
                )
            elif cmd == "render":
                remote.send([env.render() for env in envs])
            elif cmd == "get_spaces":
                remote.send((envs[0].observation_space, envs[0].action_space))
            elif cmd == "close":
                remote.close()
                break
    except KeyboardInterrupt:
        pass
    finally:
        for env in envs:
            env.close()


class _CloudpickleWrapper:
    """vec_env.py:190-204."""

    def __init__(self, x):
        self.x = x

    def __getstate__(self):
        import cloudpickle

        return cloudpickle.dumps(self.x)

    def __setstate__(self, ob):
        import pickle

        self.x = pickle.loads(ob)


class HostSubprocVecEnv(HostVecEnv):
    def __init__(self, env_fns, in_series: int = 1, context: str = "fork"):
        self.num_envs = len(env_fns)
        assert self.num_envs % in_series == 0
        self.nremotes = self.num_envs // in_series
        chunks = [
            env_fns[i * in_series : (i + 1) * in_series] for i in range(self.nremotes)
        ]
        ctx = mp.get_context(context)
        self.remotes, self.work_remotes = zip(
            *[ctx.Pipe() for _ in range(self.nremotes)]
        )
        self.ps = [
            ctx.Process(
                target=_subproc_worker,
                args=(work_remote, remote, _CloudpickleWrapper(chunk)),
            )
            for work_remote, remote, chunk in zip(self.work_remotes, self.remotes, chunks)
        ]
        for p in self.ps:
            p.daemon = True  # crashed parent must not hang (subproc_vec_env.py:63-64)
            p.start()
        for remote in self.work_remotes:
            remote.close()
        self.remotes[0].send(("get_spaces", None))
        self.observation_space, self.action_space = self.remotes[0].recv()
        self.in_series = in_series

    def reset(self, seed=None):
        for i, remote in enumerate(self.remotes):
            remote.send(("reset", None if seed is None else seed + i * self.in_series))
        obs = [o for remote in self.remotes for o in remote.recv()]
        return stack_obs(obs)

    def step_async(self, actions):
        """Dispatch to workers and return immediately — the envs step while
        the caller computes (subproc_vec_env.py:75-80)."""
        chunks = np.array_split(np.asarray(actions), self.nremotes)
        for remote, chunk in zip(self.remotes, chunks):
            remote.send(("step", chunk))

    def step_wait(self):
        """Block for outstanding worker results (subproc_vec_env.py:82-88)."""
        results = [r for remote in self.remotes for r in remote.recv()]
        obs, rews, dones, infos = zip(*results)
        return (
            stack_obs(list(obs)),
            np.asarray(rews, np.float32),
            np.asarray(dones, bool),
            list(infos),
        )

    def step(self, actions):
        self.step_async(actions)
        return self.step_wait()

    def render(self):
        from baselines_tpu.core.tile_images import tile_images

        for remote in self.remotes:
            remote.send(("render", None))
        frames = [f for remote in self.remotes for f in remote.recv()]
        return tile_images(frames)

    def close(self):
        for remote in self.remotes:
            try:
                remote.send(("close", None))
            except BrokenPipeError:
                pass
        for p in self.ps:
            p.join(timeout=1)


class HostShmemVecEnv(HostSubprocVecEnv):
    """Shared-memory obs transport (shmem_vec_env.py:20-141).

    The subprocess protocol is identical; observations are written into a
    per-env shared ctypes array by the worker and read by the parent, so the
    pipe only carries rew/done/info."""

    def __init__(self, env_fns, context: str = "fork"):
        # probe spaces first
        probe = GymAdapter(env_fns[0]())
        obs_space = probe.observation_space
        probe.close()
        assert obs_space.shape is not None, (
            "HostShmemVecEnv transports a single flat array; use "
            "HostDummyVecEnv/HostSubprocVecEnv for dict observations"
        )
        self._obs_shape = obs_space.shape
        self._obs_dtype = obs_space.dtype
        ctx = mp.get_context(context)
        n = len(env_fns)
        size = int(np.prod(self._obs_shape))
        typecode = {
            np.dtype(np.uint8): "B",
            np.dtype(np.float32): "f",
            np.dtype(np.float64): "d",
            np.dtype(np.int32): "i",
        }[np.dtype(self._obs_dtype)]
        self.shm_bufs = [ctx.Array(typecode, size, lock=False) for _ in range(n)]
        self.num_envs = n
        self.remotes, self.work_remotes = zip(*[ctx.Pipe() for _ in range(n)])
        self.ps = [
            ctx.Process(
                target=_shmem_worker,
                args=(
                    wr, r, _CloudpickleWrapper(fn), buf, self._obs_shape,
                    np.dtype(self._obs_dtype).str,
                ),
            )
            for wr, r, fn, buf in zip(self.work_remotes, self.remotes, env_fns, self.shm_bufs)
        ]
        for p in self.ps:
            p.daemon = True
            p.start()
        for remote in self.work_remotes:
            remote.close()
        self.remotes[0].send(("get_spaces", None))
        self.observation_space, self.action_space = self.remotes[0].recv()
        self.nremotes = n
        self.in_series = 1

    def _read_obs(self):
        return np.stack(
            [
                np.frombuffer(buf, dtype=self._obs_dtype).reshape(self._obs_shape)
                for buf in self.shm_bufs
            ]
        )

    def reset(self, seed=None):
        for i, remote in enumerate(self.remotes):
            remote.send(("reset", None if seed is None else seed + i))
        for remote in self.remotes:
            remote.recv()
        return self._read_obs()

    def step_async(self, actions):
        for remote, a in zip(self.remotes, actions):
            remote.send(("step", a))

    def step_wait(self):
        results = [remote.recv() for remote in self.remotes]
        rews, dones, infos = zip(*results)
        return (
            self._read_obs(),
            np.asarray(rews, np.float32),
            np.asarray(dones, bool),
            list(infos),
        )

    def step(self, actions):
        self.step_async(actions)
        return self.step_wait()


def _shmem_worker(remote, parent_remote, env_fn_wrapper, shm_buf, obs_shape, obs_dtype):
    """shmem_vec_env.py:107-141 worker: write obs to shared memory."""
    parent_remote.close()
    env = GymAdapter(env_fn_wrapper.x())
    arr = np.frombuffer(shm_buf, dtype=np.dtype(obs_dtype)).reshape(obs_shape)

    def put(obs):
        arr[...] = obs

    try:
        while True:
            cmd, data = remote.recv()
            if cmd == "step":
                obs, rew, done, info = env.step(data)
                put(obs)
                remote.send((rew, done, info))
            elif cmd == "reset":
                put(env.reset(data))
                remote.send(None)
            elif cmd == "get_spaces":
                remote.send((env.observation_space, env.action_space))
            elif cmd == "close":
                remote.close()
                break
    except KeyboardInterrupt:
        pass
    finally:
        env.close()
