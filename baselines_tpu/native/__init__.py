"""Native (C++/OpenMP) batched environment engine.

`NativeVecEnv` implements the HostVecEnv interface on top of
``csrc/envpool.cpp``: the whole env batch steps inside ONE native call
(OpenMP-parallel across envs) instead of N python ``env.step()`` calls or
subprocess pipe round-trips (subproc_vec_env.py:60-88).  Compose with
``CallbackVecEnv`` to drive it from a jitted rollout — the host side of the
io_callback then costs a single C call per step.

The shared library is compiled on demand with g++ (the image's native
toolchain) and cached next to the source keyed by a source hash; import
degrades gracefully (``available() -> False``) if no compiler is present.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "envpool.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_lock = threading.Lock()
_lib = None
_lib_err = None

NATIVE_ENV_IDS = (
    "CartPole-v0",
    "CartPole-v1",
    "Pendulum-v1",
    "MountainCar-v0",
    "MountainCarContinuous-v0",
    "Acrobot-v1",
)


def _compile() -> str:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    so_path = os.path.join(_BUILD_DIR, f"envpool_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
        "-o", tmp, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so_path)
    return so_path


def _load():
    global _lib, _lib_err
    with _lock:
        if _lib is not None or _lib_err is not None:
            return _lib
        try:
            lib = ctypes.CDLL(_compile())
        except Exception as e:  # no compiler / unsupported platform
            _lib_err = e
            return None
        lib.btenv_create.restype = ctypes.c_void_p
        lib.btenv_create.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64]
        lib.btenv_destroy.argtypes = [ctypes.c_void_p]
        for fn in ("btenv_obs_dim", "btenv_act_dim", "btenv_n_actions",
                   "btenv_state_dim", "btenv_max_steps"):
            getattr(lib, fn).restype = ctypes.c_int
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.btenv_reset.argtypes = [ctypes.c_void_p, f32p]
        lib.btenv_step.argtypes = [ctypes.c_void_p, f32p, f32p, f32p, u8p, f32p]
        lib.btenv_get_state.argtypes = [ctypes.c_void_p, f64p]
        lib.btenv_set_state.argtypes = [ctypes.c_void_p, f64p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def supports(env_id: str) -> bool:
    return env_id in NATIVE_ENV_IDS and available()


class NativeVecEnv:
    """HostVecEnv-interface batched native env (one C call per step)."""

    def __init__(self, env_id: str, num_envs: int, seed: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native engine unavailable: {_lib_err}")
        self._lib = lib
        self._handle = lib.btenv_create(env_id.encode(), num_envs, seed)
        if not self._handle:
            raise ValueError(f"native engine does not implement {env_id}")
        self.env_id = env_id
        self.num_envs = num_envs
        self._obs_dim = lib.btenv_obs_dim(self._handle)
        self._act_dim = lib.btenv_act_dim(self._handle)
        self._n_actions = lib.btenv_n_actions(self._handle)
        self.state_dim = lib.btenv_state_dim(self._handle)
        self.max_steps = lib.btenv_max_steps(self._handle)

        # spaces mirror the gymnasium envs (bounds via a gym-free lookup)
        from baselines_tpu.envs.registry import make_env

        jenv = make_env(env_id)
        self.observation_space = jenv.observation_space
        self.action_space = jenv.action_space

        n, od = num_envs, self._obs_dim
        self._obs = np.empty((n, od), np.float32)
        self._rew = np.empty((n,), np.float32)
        self._done = np.empty((n,), np.uint8)
        self._terminal_obs = np.empty((n, od), np.float32)

    # -- HostVecEnv interface ------------------------------------------------
    def reset(self, seed=None):
        if seed is not None:
            # re-create handle for deterministic reseeding
            self._lib.btenv_destroy(self._handle)
            self._handle = self._lib.btenv_create(
                self.env_id.encode(), self.num_envs, int(seed)
            )
        self._lib.btenv_reset(self._handle, self._obs)
        return self._obs.copy()

    def step_async(self, actions):
        """Run the native batch step on a worker thread — ctypes releases
        the GIL for the duration of the C call, so the env batch steps
        concurrently with device compute (the step_async/step_wait split of
        subproc_vec_env.py:75-88, minus the processes)."""
        import concurrent.futures

        if not hasattr(self, "_pool"):
            self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        acts = np.ascontiguousarray(
            np.reshape(np.asarray(actions, np.float32), (self.num_envs, self._act_dim))
        )
        self._pending = self._pool.submit(
            self._lib.btenv_step,
            self._handle, acts, self._obs, self._rew, self._done, self._terminal_obs,
        )

    def step_wait(self):
        self._pending.result()
        self._pending = None
        return self._collect()

    def step(self, actions):
        acts = np.ascontiguousarray(
            np.reshape(np.asarray(actions, np.float32), (self.num_envs, self._act_dim))
        )
        self._lib.btenv_step(
            self._handle, acts, self._obs, self._rew, self._done, self._terminal_obs
        )
        return self._collect()

    def _collect(self):
        done = self._done.astype(bool)
        infos = [
            # copy: self._terminal_obs is a reused buffer the next step()
            # overwrites in place; consumers may retain infos across steps
            {"terminal_observation": self._terminal_obs[i].copy()} if done[i] else {}
            for i in range(self.num_envs)
        ]
        return self._obs.copy(), self._rew.copy(), done, infos

    # -- testing hooks ---------------------------------------------------------
    def get_state(self) -> np.ndarray:
        out = np.empty((self.num_envs, self.state_dim), np.float64)
        self._lib.btenv_get_state(self._handle, out)
        return out

    def set_state(self, state: np.ndarray) -> None:
        s = np.ascontiguousarray(np.asarray(state, np.float64))
        assert s.shape == (self.num_envs, self.state_dim)
        self._lib.btenv_set_state(self._handle, s)

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.btenv_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
