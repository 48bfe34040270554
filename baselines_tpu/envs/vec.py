"""The vectorized rollout engine — TPU-native replacement for the entire
``baselines/common/vec_env`` package.

The reference steps N envs in worker subprocesses and ships obs over pipes or
shared memory every step (subproc_vec_env.py:60-88, shmem_vec_env.py:20-105).
Here a vector env is ``jax.vmap`` over a pure env, so N env steps are one
fused device computation and a T-step rollout is a ``lax.scan`` inside the
jitted train step — zero host crossings.

The vector interface is the SAME functional contract as a single env, just
batched, so wrappers compose identically at either level:

    obs, state = venv.reset(key)                      # obs: (N, ...)
    obs, state, rew, done, info = venv.step(key, state, actions)

Auto-reset semantics match the subprocess workers (subproc_vec_env.py:8-12):
when an env reports done, the returned obs/state are the RESET obs/state; the
pre-reset terminal observation is surfaced as info['terminal_obs'].

Wrappers provided (reference analogs):
  VecMonitor     — episode return/length accounting as device state
                   (vec_monitor.py:7-55 + the epinfobuf deque ppo2/ppo2.py:118)
  VecFrameStack  — rolling k-frame stack along the channel axis
                   (vec_frame_stack.py:6-30)
  VecNormalize   — obs/return normalization with running statistics
                   (vec_normalize.py:4-47); stats live in env state so they
                   checkpoint with the model, fixing README.md:117's wart
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from baselines_tpu.core.running_stats import RunningMeanStd
from baselines_tpu.envs.base import JaxEnv
from baselines_tpu.envs.spaces import Box

EPISODE_BUFFER = 100  # matches deque(maxlen=100) of epinfos, ppo2/ppo2.py:118


def _where_done(done, a, b):
    """Select a where done else b, broadcasting done over trailing dims."""
    d = done.reshape(done.shape + (1,) * (a.ndim - done.ndim))
    return jnp.where(d, a, b)


@struct.dataclass
class EpisodeStats:
    """Per-env accumulators + a device ring buffer of the last 100 completed
    episode returns/lengths — the info['episode'] pipeline (bench/monitor.py:58-75)
    rebuilt as pure state."""

    ep_return: jnp.ndarray  # (N,)
    ep_length: jnp.ndarray  # (N,)
    ret_buffer: jnp.ndarray  # (EPISODE_BUFFER,)
    len_buffer: jnp.ndarray  # (EPISODE_BUFFER,)
    episodes: jnp.ndarray  # scalar int32, total completed
    total_steps: jnp.ndarray  # scalar int64-ish float

    @staticmethod
    def create(num_envs: int) -> "EpisodeStats":
        return EpisodeStats(
            ep_return=jnp.zeros((num_envs,), jnp.float32),
            ep_length=jnp.zeros((num_envs,), jnp.int32),
            ret_buffer=jnp.zeros((EPISODE_BUFFER,), jnp.float32),
            len_buffer=jnp.zeros((EPISODE_BUFFER,), jnp.float32),
            episodes=jnp.zeros((), jnp.int32),
            total_steps=jnp.zeros((), jnp.float32),
        )

    def update(self, reward, done) -> "EpisodeStats":
        n = reward.shape[0]
        ep_return = self.ep_return + reward
        ep_length = self.ep_length + 1
        # scatter completed episodes into the ring buffer
        order = jnp.cumsum(done.astype(jnp.int32)) - 1  # 0-based among dones
        slot = (self.episodes + order) % EPISODE_BUFFER
        slot = jnp.where(done, slot, EPISODE_BUFFER)  # OOB => dropped
        ret_buffer = self.ret_buffer.at[slot].set(ep_return, mode="drop")
        len_buffer = self.len_buffer.at[slot].set(
            ep_length.astype(jnp.float32), mode="drop"
        )
        n_done = jnp.sum(done.astype(jnp.int32))
        return EpisodeStats(
            ep_return=jnp.where(done, 0.0, ep_return),
            ep_length=jnp.where(done, 0, ep_length),
            ret_buffer=ret_buffer,
            len_buffer=len_buffer,
            episodes=self.episodes + n_done,
            total_steps=self.total_steps + n,
        )

    def _masked_mean(self, buf):
        valid = jnp.minimum(self.episodes, EPISODE_BUFFER)
        mask = jnp.arange(EPISODE_BUFFER) < valid
        return jnp.where(
            valid > 0, jnp.sum(jnp.where(mask, buf, 0.0)) / jnp.maximum(valid, 1), jnp.nan
        )

    @property
    def mean_return(self):
        """eprewmean (ppo2/ppo2.py:201)."""
        return self._masked_mean(self.ret_buffer)

    @property
    def mean_length(self):
        """eplenmean (ppo2/ppo2.py:202)."""
        return self._masked_mean(self.len_buffer)

    def _masked_sum_and_count(self, buf):
        valid = jnp.minimum(self.episodes, EPISODE_BUFFER)
        mask = jnp.arange(EPISODE_BUFFER) < valid
        return jnp.sum(jnp.where(mask, buf, 0.0)), valid

    def merge(self, other: "EpisodeStats") -> "MergedStats":
        """Episode-count-weighted view over two groups' recent episodes —
        logging aggregation for the pipelined env pair (host_pipeline.py)."""
        rs, rc = self._masked_sum_and_count(self.ret_buffer)
        ros, roc = other._masked_sum_and_count(other.ret_buffer)
        ls, _ = self._masked_sum_and_count(self.len_buffer)
        los, _ = other._masked_sum_and_count(other.len_buffer)
        total = rc + roc
        denom = jnp.maximum(total, 1)
        return MergedStats(
            mean_return=jnp.where(total > 0, (rs + ros) / denom, jnp.nan),
            mean_length=jnp.where(total > 0, (ls + los) / denom, jnp.nan),
            episodes=self.episodes + other.episodes,
        )


@struct.dataclass
class MergedStats:
    mean_return: jnp.ndarray
    mean_length: jnp.ndarray
    episodes: jnp.ndarray


class VecJaxEnv:
    """vmap-batched env with subprocess-matching auto-reset."""

    def __init__(self, env: JaxEnv, num_envs: int):
        self.env = env
        self.num_envs = int(num_envs)
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self._vreset = jax.vmap(env.reset)
        self._vstep = jax.vmap(env.step)

    def reset(self, key):
        keys = jax.random.split(key, self.num_envs)
        return self._vreset(keys)

    def step(self, key, state, actions):
        kstep, kreset = jax.random.split(key)
        step_keys = jax.random.split(kstep, self.num_envs)
        obs, st, rew, done, info = self._vstep(step_keys, state, actions)
        info = dict(info)
        info["terminal_obs"] = obs

        # auto-reset (subproc_vec_env.py:8-12 semantics), gated on any(done):
        # dones are rare within an episode, so computing the batched reset
        # unconditionally wastes roughly an env-step of work per step — the
        # cond is a real branch at the top jit level (it only degrades to a
        # computed select under vmap).  reset_keys derive from kreset either
        # way, so gating is bit-exact with the ungated version.
        def _do_reset(args):
            obs, st = args
            reset_keys = jax.random.split(kreset, self.num_envs)
            robs, rst = self._vreset(reset_keys)
            new_obs = _where_done(done, robs, obs)
            new_state = jax.tree_util.tree_map(partial(_where_done, done), rst, st)
            return new_obs, new_state

        new_obs, new_state = jax.lax.cond(
            jnp.any(done), _do_reset, lambda args: args, (obs, st)
        )
        return new_obs, new_state, rew.astype(jnp.float32), done, info


class VecWrapper:
    """Base vec wrapper.  Every concrete wrapper is a pure POST-transform of
    the inner step results (none touches actions), factored as
    `unwrap_state` + `post` so a pipelined rollout engine can drive the base
    env's submit/collect split and replay the wrapper chain on collect
    (envs/host_pipeline.py)."""

    def __init__(self, venv):
        self.venv = venv
        self.num_envs = venv.num_envs
        self.observation_space = venv.observation_space
        self.action_space = venv.action_space

    def reset(self, key):
        return self.venv.reset(key)

    def unwrap_state(self, state):
        """This wrapper's view of the inner env state (identity for
        stateless wrappers)."""
        return state

    def post(self, state, obs, inner_state, rew, done, info):
        """Transform inner step results; returns the standard 5-tuple with
        this wrapper's state rebuilt around `inner_state`."""
        return obs, inner_state, rew, done, info

    def step(self, key, state, actions):
        obs, inner, rew, done, info = self.venv.step(
            key, self.unwrap_state(state), actions
        )
        return self.post(state, obs, inner, rew, done, info)

    def close(self):
        # forwarded like VecEnvWrapper (vec_env.py:140-175); releases host
        # resources when a CallbackVecEnv/host pool sits underneath
        close = getattr(self.venv, "close", None)
        if close is not None:
            close()


@struct.dataclass
class MonitorState:
    inner: Any
    stats: EpisodeStats


class VecMonitor(VecWrapper):
    """Episode accounting as device state (vec_monitor.py:7-55)."""

    def reset(self, key):
        obs, inner = self.venv.reset(key)
        return obs, MonitorState(inner, EpisodeStats.create(self.num_envs))

    def unwrap_state(self, state):
        return state.inner

    def post(self, state, obs, inner, rew, done, info):
        stats = state.stats.update(rew, done)
        return obs, MonitorState(inner, stats), rew, done, info

    @staticmethod
    def get_stats(state):
        if hasattr(state, "state_a"):  # pipelined pair: merge both groups
            return VecMonitor.get_stats(state.state_a).merge(
                VecMonitor.get_stats(state.state_b)
            )
        while not isinstance(state, MonitorState):
            state = state.inner
        return state.stats


@struct.dataclass
class FrameStackState:
    inner: Any
    frames: jnp.ndarray  # (N, ..., C*k)


class VecFrameStack(VecWrapper):
    """Roll the last k frames along the last (channel) axis
    (vec_frame_stack.py:6-30): on done, the stack is zeroed before inserting
    the reset frame."""

    def __init__(self, venv, k: int):
        super().__init__(venv)
        self.k = int(k)
        sp = venv.observation_space
        low = np.repeat(sp.low, self.k, axis=-1)
        high = np.repeat(sp.high, self.k, axis=-1)
        self.observation_space = Box(low, high, dtype=sp.dtype)
        self._c = sp.shape[-1]

    def _insert(self, frames, obs):
        shifted = jnp.roll(frames, -self._c, axis=-1)
        return shifted.at[..., -self._c :].set(obs)

    def reset(self, key):
        obs, inner = self.venv.reset(key)
        frames = jnp.zeros(
            (self.num_envs,) + self.observation_space.shape,
            self.observation_space.dtype,
        )
        frames = self._insert(frames, obs)
        return frames, FrameStackState(inner, frames)

    def unwrap_state(self, state):
        return state.inner

    def post(self, state, obs, inner, rew, done, info):
        if "terminal_obs" in info:
            # the true terminal s' stack: previous frames shifted by the
            # PRE-reset terminal frame (no zeroing — the episode hadn't
            # reset when s' was observed)
            info = dict(
                info, terminal_obs=self._insert(state.frames, info["terminal_obs"])
            )
        frames = _where_done(done, jnp.zeros_like(state.frames), state.frames)
        frames = self._insert(frames, obs)
        return frames, FrameStackState(inner, frames), rew, done, info


class VecExtractDictObs(VecWrapper):
    """Project Dict observations to one key
    (vec_env/vec_remove_dict_obs.py:3-10)."""

    def __init__(self, venv, key: str):
        super().__init__(venv)
        self.key = key
        self.observation_space = venv.observation_space[key]

    def _proj(self, obs):
        return obs[self.key]

    def reset(self, key):
        obs, state = self.venv.reset(key)
        return self._proj(obs), state

    def post(self, state, obs, inner, rew, done, info):
        if "terminal_obs" in info:
            info = dict(info, terminal_obs=self._proj(info["terminal_obs"]))
        return self._proj(obs), inner, rew, done, info


class VecFlattenDictObs(VecWrapper):
    """Concatenate selected Dict-obs keys into one flat Box — the
    make_robotics_env FlattenDictWrapper(['observation', 'desired_goal'])
    contract (cmd_util.py:124-135) that lets non-goal algorithms train on
    goal envs."""

    def __init__(self, venv, keys=("observation", "desired_goal")):
        import numpy as np

        from baselines_tpu.envs.spaces import Box

        super().__init__(venv)
        self.keys = tuple(keys)
        spaces = [venv.observation_space[k] for k in self.keys]
        assert all(len(s.shape) == 1 for s in spaces), "flatten needs 1-D parts"
        dim = sum(s.shape[0] for s in spaces)
        self.observation_space = Box(
            np.full((dim,), -np.inf, np.float32),
            np.full((dim,), np.inf, np.float32),
            (dim,),
            np.float32,
        )

    def _flat(self, obs):
        return jnp.concatenate([obs[k] for k in self.keys], axis=-1)

    def reset(self, key):
        obs, state = self.venv.reset(key)
        return self._flat(obs), state

    def post(self, state, obs, inner, rew, done, info):
        if "terminal_obs" in info:
            info = dict(info, terminal_obs=self._flat(info["terminal_obs"]))
        return self._flat(obs), inner, rew, done, info


class VecS2D(VecWrapper):
    """Space-to-depth observation packing: (H, W, C) -> (H/b, W/b, b*b*C).

    TPU-native layout optimization with no reference counterpart: Atari
    frames (84x84x4 uint8) keep the channel (minor) dimension at 4, which
    wastes most of each (8,128) vector-lane tile and starves the conv of
    bandwidth; packing 4x4 spatial blocks into channels yields 21x21x64 —
    lane-aligned — and turns the Nature conv1 8x8/s4 into an EXACTLY
    equivalent 2x2/s1 conv (each stride-4 8x8 window covers 2x2 whole
    blocks, so the weights are a bijective reshape).  Measured 29% faster
    CNN fwd+bwd on a v5e.  Pair with the ``cnn_s2d``/``cnn`` networks via
    ``build_policy`` (nn/networks.py cnn_s2d).  The transform runs once per
    env step on uint8 frames, so rollout HBM traffic is unchanged."""

    def __init__(self, venv, block: int = 4, flat: bool = False):
        super().__init__(venv)
        sp = venv.observation_space
        h, w, c = sp.shape
        assert h % block == 0 and w % block == 0, (
            f"obs {sp.shape} not divisible by s2d block {block}"
        )
        self.block = int(block)
        self.flat = bool(flat)
        packed = (h // block, w // block, block * block * c)
        # flat mode: emit each packed frame as ONE contiguous row.  The 3-D
        # packed shape (21,21,64) gets a (sublane,lane)-padded HBM layout on
        # TPU — physically 21x24x128 = 2.3x the logical bytes — so every
        # rollout store and epoch-shuffle gather of the obs batch moves 2.3x
        # the data.  A (28224,) row pads only to the next lane multiple
        # (+0.2%), and the reshape back to (21,21,64) fuses into the
        # network's uint8->bf16 cast for free (scripts/profile_gather.py).
        shape = (int(np.prod(packed)),) if self.flat else packed
        self.observation_space = Box(
            np.min(sp.low), np.max(sp.high), shape, dtype=sp.dtype,
        )
        if self.flat:
            self.observation_space.packed_shape = packed

    def _pack(self, obs):
        b = self.block
        n, h, w, c = obs.shape
        x = obs.reshape(n, h // b, b, w // b, b, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // b, w // b, b * b * c)
        return x.reshape(n, -1) if self.flat else x

    def reset(self, key):
        obs, inner = self.venv.reset(key)
        return self._pack(obs), inner

    def post(self, state, obs, inner, rew, done, info):
        if "terminal_obs" in info:
            info = dict(info, terminal_obs=self._pack(info["terminal_obs"]))
        return self._pack(obs), inner, rew, done, info


class VecRewardScale(VecWrapper):
    """reward *= scale at the vector level — the --reward_scale flag
    (cmd_util.py:43, applied per-env in make_env via RewardScaler,
    retro_wrappers.py).  Sits OUTSIDE VecMonitor so episode stats stay in
    raw units, INSIDE VecNormalize so return normalization sees the scaled
    stream (reference wrapper order in cmd_util.make_env)."""

    def __init__(self, venv, scale: float):
        super().__init__(venv)
        self.scale = float(scale)

    def post(self, state, obs, inner, rew, done, info):
        return obs, inner, rew * self.scale, done, info


@struct.dataclass
class NormalizeState:
    inner: Any
    ob_rms: RunningMeanStd
    ret_rms: RunningMeanStd
    ret: jnp.ndarray  # (N,) discounted return accumulator


class VecNormalize(VecWrapper):
    """Observation and return normalization (vec_normalize.py:4-47).

    The running statistics are part of env state, so they serialize inside
    the train-state checkpoint (unlike the reference, where only the
    use_tf=True variant checkpoints — README.md:117).  Pass axis_name to
    psum-merge batch moments across a mesh axis when stepping under
    shard_map (mpi_running_mean_std.py replacement).
    """

    def __init__(
        self,
        venv,
        ob: bool = True,
        ret: bool = True,
        clipob: float = 10.0,
        cliprew: float = 10.0,
        gamma: float = 0.99,
        epsilon: float = 1e-8,
        axis_name: str | None = None,
    ):
        super().__init__(venv)
        self.ob = ob
        self.ret_flag = ret
        self.clipob = clipob
        self.cliprew = cliprew
        self.gamma = gamma
        self.epsilon = epsilon
        self.axis_name = axis_name

    def _norm_obs(self, ob_rms, obs):
        if not self.ob:
            return obs
        return ob_rms.normalize(obs, clip=self.clipob, epsilon=self.epsilon)

    # trained statistics injected before reset (evaluate/--play uses this to
    # replay a saved model under the normalization it was trained with)
    _init_stats = None

    def reset(self, key):
        obs, inner = self.venv.reset(key)
        if self._init_stats is not None:
            ob_rms, ret_rms = self._init_stats
        else:
            ob_rms = RunningMeanStd.create(self.observation_space.shape)
            ret_rms = RunningMeanStd.create(())
        if self.ob:
            ob_rms = ob_rms.update(obs, axis_name=self.axis_name)
        state = NormalizeState(
            inner, ob_rms, ret_rms, jnp.zeros((self.num_envs,), jnp.float32)
        )
        return self._norm_obs(ob_rms, obs), state

    def unwrap_state(self, state):
        return state.inner

    def post(self, state, obs, inner, rew, done, info):
        ob_rms, ret_rms, ret = state.ob_rms, state.ret_rms, state.ret
        ret = ret * self.gamma + rew
        if self.ob:
            ob_rms = ob_rms.update(obs, axis_name=self.axis_name)
        if self.ret_flag:
            ret_rms = ret_rms.update(ret, axis_name=self.axis_name)
            rew = jnp.clip(
                rew / jnp.sqrt(ret_rms.var + self.epsilon),
                -self.cliprew,
                self.cliprew,
            )
        ret = jnp.where(done, 0.0, ret)
        new_state = NormalizeState(inner, ob_rms, ret_rms, ret)
        if "terminal_obs" in info:
            # replay learners store info['terminal_obs'] as the true s';
            # it must live in the same (normalized) space as obs
            info = dict(info, terminal_obs=self._norm_obs(ob_rms, info["terminal_obs"]))
        return self._norm_obs(ob_rms, obs), new_state, rew, done, info


def find_normalize_state(env_state) -> NormalizeState | None:
    """Walk the wrapper-state chain for a NormalizeState (None if the env is
    not normalized).  Used to fold VecNormalize statistics into Model.save —
    the --save_path/--play normalization fix (README.md:117 wart).  For a
    pipelined env pair (host_pipeline.PipeState) group A's statistics are
    returned (the groups are merged every rollout)."""
    while env_state is not None:
        if isinstance(env_state, NormalizeState):
            return env_state
        if hasattr(env_state, "state_a"):
            env_state = env_state.state_a
            continue
        env_state = getattr(env_state, "inner", None)
    return None


def replace_normalize_stats(env_state, ob_rms, ret_rms):
    """Return env_state with its NormalizeState's running statistics swapped
    for the given ones (no-op when the chain has no NormalizeState); both
    groups of a pipelined pair are updated."""
    if env_state is None:
        return None
    if isinstance(env_state, NormalizeState):
        return env_state.replace(ob_rms=ob_rms, ret_rms=ret_rms)
    if hasattr(env_state, "state_a"):
        return env_state.replace(
            state_a=replace_normalize_stats(env_state.state_a, ob_rms, ret_rms),
            state_b=replace_normalize_stats(env_state.state_b, ob_rms, ret_rms),
        )
    inner = getattr(env_state, "inner", None)
    if inner is None:
        return env_state
    return env_state.replace(inner=replace_normalize_stats(inner, ob_rms, ret_rms))
