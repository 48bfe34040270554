"""Shared learner scaffolding.

- `build_env`: env-id → monitored vector env with the standard wrapper chain
  per env type (cmd_util.make_vec_env / run.build_env analog,
  baselines/run.py:86-118).
- `run_rollout`: the T-step on-device rollout scan — the replacement for
  AbstractEnvRunner.run (common/runners.py:4-18) and the per-alg runner
  classes; returns a time-major trajectory pytree.
- `Model`: the object `learn` returns, with .step/.value/.save/.load mirroring
  PolicyWithValue's surface (common/policies.py:77-118) so downstream code
  (CLI --play, tests) has one contract for every algorithm.
- `adam_optimizer`/`apply_updates_lr`: gradient-clip + Adam with the learning
  rate supplied per-update as a traced scalar (the reference feeds LR through
  feed_dict each minibatch, ppo2/model.py:91-116).
"""

from __future__ import annotations

import os.path as osp
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from baselines_tpu.core import checkpoint as ckpt
from baselines_tpu.envs.registry import get_env_type, is_jax_env, make_env
from baselines_tpu.envs.vec import VecFrameStack, VecJaxEnv, VecMonitor, VecNormalize


def make_host_vec_env(env_id: str, num_envs: int, env_type: str,
                      need_render: bool = False, gamestate=None,
                      keep_dict_obs: bool = False):
    """gymnasium-backed vec env behind the io_callback bridge; Atari ids get
    the DeepMind wrapper chain + device frame stack."""
    from baselines_tpu.envs.callback_env import CallbackVecEnv
    from baselines_tpu.envs.gym_bridge import HostDummyVecEnv, HostSubprocVecEnv

    if env_type == "atari":
        from baselines_tpu.envs.atari import make_atari_vec_env

        return make_atari_vec_env(env_id, num_envs, need_render=need_render)
    if env_type == "retro":
        if need_render:
            # retro.make exposes no render surface compatible with the
            # host-pool frame_fn; fail loudly instead of at the first
            # video trigger (step 0)
            raise ValueError(
                "--save_video_interval is unsupported for retro envs; "
                "remove the flag or record from a gymnasium env"
            )
        from baselines_tpu.envs.retro_wrappers import make_retro_vec_env

        return make_retro_vec_env(env_id, num_envs, gamestate=gamestate)

    def thunk():
        import gymnasium as gym

        if env_type == "robotics":
            import gymnasium_robotics

            gym.register_envs(gymnasium_robotics)
        return gym.make(env_id, render_mode="rgb_array" if need_render else None)

    host = (
        HostSubprocVecEnv([thunk] * num_envs)
        if num_envs > 1
        else HostDummyVecEnv([thunk])
    )
    venv = CallbackVecEnv(host)
    from baselines_tpu.envs.spaces import DictSpace

    if not keep_dict_obs and isinstance(venv.observation_space, DictSpace):
        # non-goal algorithms see obs ++ desired_goal as one flat Box
        # (make_robotics_env's FlattenDictWrapper, cmd_util.py:124-135);
        # HER builds its own goal-preserving chain instead
        from baselines_tpu.envs.vec import VecFlattenDictObs

        venv = VecFlattenDictObs(venv)
    return venv


def build_env(
    env_id: str,
    num_envs: int,
    *,
    normalize: bool | None = None,
    reward_scale: float = 1.0,
    axis_name: str | None = None,
    frame_stack: int = 0,
    save_video_interval: int = 0,
    save_video_length: int = 200,
    video_dir: str | None = None,
    gamestate=None,
    keep_dict_obs: bool = False,
    s2d: int = 0,
):
    """Standard chain: base vec env → VecMonitor → [VecRewardScale] →
    [VecNormalize for continuous control] → [VecFrameStack] →
    [VecVideoRecorder] (run.py:86-118: mujoco gets VecNormalize, atari gets
    VecFrameStack, run.py:102-103; --reward_scale applies per step like
    cmd_util.make_env's RewardScaler, outside Monitor so episode stats stay
    raw; --save_video_interval wraps outermost like ref run.py:104-108).

    A ``native:`` env-id prefix forces the C++ batched engine
    (baselines_tpu/native) behind the io_callback bridge — the native host
    data-plane path, exercised even for ids that also exist as pure-JAX
    envs."""
    from baselines_tpu.envs.vec import VecRewardScale

    frame_fn = None  # for video capture, resolved per branch
    jax_base_env = None
    host_env = None

    if env_id.startswith("native:"):
        from baselines_tpu import native
        from baselines_tpu.envs.callback_env import CallbackVecEnv

        raw_id = env_id.split(":", 1)[1]
        venv = VecMonitor(CallbackVecEnv(native.NativeVecEnv(raw_id, num_envs)))
        env_type = None
    else:
        env_type = get_env_type(env_id)
        if is_jax_env(env_id):
            env = make_env(env_id)
            from baselines_tpu.envs.base import ClipActions
            from baselines_tpu.envs.spaces import Box as _Box

            if isinstance(env.action_space, _Box):
                env = ClipActions(env)  # cmd_util.py:96-99 clips Box actions always
            jax_base_env = env
            venv = VecMonitor(VecJaxEnv(env, num_envs))
        else:
            # host gymnasium env behind the io_callback bridge; Subproc when
            # parallel, Dummy otherwise (cmd_util.py:56-59)
            host_env = make_host_vec_env(
                env_id, num_envs, env_type,
                need_render=save_video_interval > 0, gamestate=gamestate,
                keep_dict_obs=keep_dict_obs,
            )
            venv = VecMonitor(host_env)
    if reward_scale != 1.0:
        venv = VecRewardScale(venv, reward_scale)
    if normalize is None:
        normalize = env_type == "mujoco"
    if normalize:
        venv = VecNormalize(venv, axis_name=axis_name)
    if frame_stack and frame_stack > 1:
        venv = VecFrameStack(venv, frame_stack)
    if s2d:
        # TPU lane-aligned obs packing (envs/vec.py VecS2D); sits after
        # frame stacking so all stacked channels pack together.  flat=False:
        # the flat-row layout saves 2.3x on obs HBM footprint and makes the
        # standalone rollout scan 3x faster, but measured 5% SLOWER on the
        # fused train iteration (the per-minibatch unflatten defeats XLA's
        # cast/conv fusion) — so the packed 3-D layout stays the default
        # (scripts/profile_gather.py, profile_sharded.py 2026-08-21)
        from baselines_tpu.envs.vec import VecS2D

        if s2d < 2:
            raise ValueError(f"--s2d must be a block size >= 2, got {s2d}")
        venv = VecS2D(venv, s2d, flat=False)
    if save_video_interval:
        from baselines_tpu.core import logger
        from baselines_tpu.envs.video import VecVideoRecorder, jax_env_frame_fn

        if jax_base_env is not None:
            frame_fn = jax_env_frame_fn(jax_base_env)
        elif host_env is not None:
            # peel device-side wrappers (VecFrameStack etc.) and the
            # CallbackVecEnv down to the live host pool
            pool = host_env
            while not hasattr(pool, "host") and hasattr(pool, "venv"):
                pool = pool.venv
            pool = getattr(pool, "host", pool)
            frame_fn = lambda _state: pool.render()
        else:
            raise ValueError("--save_video_interval: native envs do not render")
        venv = VecVideoRecorder(
            venv,
            video_dir or osp.join(logger.get_dir() or ".", "videos"),
            record_video_trigger=lambda step: step % save_video_interval == 0,
            video_length=save_video_length,
            frame_fn=frame_fn,
        )
    return venv


def build_env_pair(env_id: str, num_envs: int, **env_kwargs):
    """Two identical host-backed env chains of num_envs/2 each, bundled for
    the overlapped (antiphase) rollout — see envs/host_pipeline.py.  The
    groups own separate worker pools so one can step while the other's
    actions are computed on device."""
    from baselines_tpu.envs.host_pipeline import PipelinedHostVecPair

    assert num_envs >= 2 and num_envs % 2 == 0, "pipelining needs an even env count >= 2"
    assert not env_kwargs.get("save_video_interval"), (
        "video capture is not supported on the pipelined rollout path"
    )
    half = num_envs // 2
    return PipelinedHostVecPair(
        build_env(env_id, half, **env_kwargs), build_env(env_id, half, **env_kwargs)
    )


@struct.dataclass
class Trajectory:
    """Time-major (T, N, ...) rollout record."""

    obs: Any
    actions: jnp.ndarray
    values: jnp.ndarray
    neglogps: jnp.ndarray
    rewards: jnp.ndarray
    dones: jnp.ndarray  # done AT step t (obs_{t+1} is reset)
    rnn_masks: jnp.ndarray  # done BEFORE step t (zeroes rnn carry), (T, N)


def run_rollout(policy, venv, params, key, env_state, obs, rnn_state, last_done, nsteps: int):
    """Scan nsteps of policy.step + venv.step.

    Returns (key, env_state, obs, rnn_state, last_done, traj, last_value).
    `last_done` threading provides the rnn carry mask contract of
    a2c/utils.py:88-91 (mask at step t = done at t-1).
    """

    def body(carry, _):
        key, env_state, obs, rnn_state, last_done = carry
        key, kact, kstep = jax.random.split(key, 3)
        mask = last_done.astype(jnp.float32)
        action, value, neglogp, new_rnn = policy.step(params, kact, obs, rnn_state, mask)
        nobs, nstate, rew, ndone, info = venv.step(kstep, env_state, action)
        t = Trajectory(
            obs=obs,
            actions=action,
            values=value,
            neglogps=neglogp,
            rewards=rew,
            dones=ndone,
            rnn_masks=mask,
        )
        return (key, nstate, nobs, new_rnn, ndone), t

    (key, env_state, obs, rnn_state, last_done), traj = jax.lax.scan(
        body, (key, env_state, obs, rnn_state, last_done), None, length=nsteps
    )
    last_value = policy.value(
        params, obs, rnn_state, last_done.astype(jnp.float32)
    )
    return key, env_state, obs, rnn_state, last_done, traj, last_value


def init_pipe_state(policy, pair, params, key, reset_a, reset_b):
    """Prime the pipelined rollout: group B's first action is computed and
    submitted so every subsequent scan body finds one B step in flight.
    Runs eagerly once at training start (io_callbacks execute host-side)."""
    from baselines_tpu.envs.host_pipeline import PipeState

    assert not policy.is_recurrent, "pipelined rollouts support feedforward policies"
    obs_a, st_a = reset_a
    obs_b, st_b = reset_b
    # VecNormalize: both groups must branch from a COMMON prior so the
    # per-rollout merge_branched(prev, a, b) reconstruction is exact from
    # the very first rollout (core/running_stats.py:84) — union the two
    # reset contributions and seed both groups with it
    from baselines_tpu.envs.vec import find_normalize_state, replace_normalize_stats

    ns_a, ns_b = find_normalize_state(st_a), find_normalize_state(st_b)
    if ns_a is not None and ns_b is not None:
        from baselines_tpu.core.running_stats import RunningMeanStd, merge_branched

        def union(a, b):
            zero = RunningMeanStd(
                mean=jnp.zeros_like(a.mean), var=jnp.zeros_like(a.var),
                count=jnp.zeros_like(a.count),
            )
            return merge_branched(zero, a, b)

        ob_rms = union(ns_a.ob_rms, ns_b.ob_rms)
        ret_rms = union(ns_a.ret_rms, ns_b.ret_rms)
        st_a = replace_normalize_stats(st_a, ob_rms, ret_rms)
        st_b = replace_normalize_stats(st_b, ob_rms, ret_rms)
    n = pair.a.num_envs
    act_b, val_b, nlp_b, _ = policy.step(params, key, obs_b, None, None)
    pair.submit_b(act_b)
    return PipeState(
        state_a=st_a,
        state_b=st_b,
        obs_a=obs_a,
        pend_obs_b=obs_b,
        pend_act_b=act_b,
        pend_val_b=val_b,
        pend_nlp_b=nlp_b,
        last_done_a=jnp.zeros((n,), bool),
        last_done_b=jnp.zeros((n,), bool),
    )


def run_rollout_pipelined(policy, pair, params, key, ps, nsteps: int):
    """T antiphase steps over the env-group pair: group A's host step runs
    while the device computes group B's actions and vice versa
    (envs/host_pipeline.py).  Returns (key, pipe_state, traj, last_value)
    with traj leaves (T, N) — group A in columns [:N/2], group B (one env
    step behind in wall-clock, fully on-policy) in columns [N/2:].

    VecNormalize statistics of the two groups are exactly re-merged after
    the scan (running_stats.merge_branched), the in-process analog of the
    reference's cross-rank moment Allreduce (mpi_running_mean_std.py:41-48).
    """
    from baselines_tpu.core.running_stats import merge_branched
    from baselines_tpu.envs.host_pipeline import PipeState, collect_through
    from baselines_tpu.envs.vec import find_normalize_state, replace_normalize_stats

    ns_prev = find_normalize_state(ps.state_a)

    def body(carry, _):
        key, ps = carry
        key, ka, kb = jax.random.split(key, 3)
        mask_a = ps.last_done_a.astype(jnp.float32)
        act_a, val_a, nlp_a, _ = policy.step(params, ka, ps.obs_a, None, None)
        # submit A (A's envs now stepping), harvest B's in-flight step
        base_b = pair.swap_ab(act_a)
        obs_b, st_b, rew_b, done_b, _ = collect_through(pair.b, ps.state_b, base_b)
        tb = Trajectory(
            obs=ps.pend_obs_b,
            actions=ps.pend_act_b,
            values=ps.pend_val_b,
            neglogps=ps.pend_nlp_b,
            rewards=rew_b,
            dones=done_b,
            rnn_masks=ps.last_done_b.astype(jnp.float32),
        )
        # B's next action computes while A's envs are still stepping
        act_b, val_b, nlp_b, _ = policy.step(params, kb, obs_b, None, None)
        base_a = pair.swap_ba(act_b)
        obs_a, st_a, rew_a, done_a, _ = collect_through(pair.a, ps.state_a, base_a)
        ta = Trajectory(
            obs=ps.obs_a,
            actions=act_a,
            values=val_a,
            neglogps=nlp_a,
            rewards=rew_a,
            dones=done_a,
            rnn_masks=mask_a,
        )
        nps = PipeState(
            state_a=st_a,
            state_b=st_b,
            obs_a=obs_a,
            pend_obs_b=obs_b,
            pend_act_b=act_b,
            pend_val_b=val_b,
            pend_nlp_b=nlp_b,
            last_done_a=done_a,
            last_done_b=done_b,
        )
        return (key, nps), (ta, tb)

    (key, ps), (ta, tb) = jax.lax.scan(body, (key, ps), None, length=nsteps)
    traj = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=1), ta, tb
    )
    last_val_a = policy.value(params, ps.obs_a, None, None)
    last_value = jnp.concatenate([last_val_a, ps.pend_val_b], axis=0)

    if ns_prev is not None:
        na = find_normalize_state(ps.state_a)
        nb = find_normalize_state(ps.state_b)
        ob_rms = merge_branched(ns_prev.ob_rms, na.ob_rms, nb.ob_rms)
        ret_rms = merge_branched(ns_prev.ret_rms, na.ret_rms, nb.ret_rms)
        ps = ps.replace(
            state_a=replace_normalize_stats(ps.state_a, ob_rms, ret_rms),
            state_b=replace_normalize_stats(ps.state_b, ob_rms, ret_rms),
        )
    return key, ps, traj, last_value


def adam_optimizer(max_grad_norm: float | None, eps: float = 1e-5):
    """Clip-then-Adam, LR applied separately (ppo2/model.py:97-116 order)."""
    parts = []
    if max_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    parts.append(optax.scale_by_adam(eps=eps))
    return optax.chain(*parts)


def apply_updates_lr(tx, params, opt_state, grads, lr):
    updates, opt_state = tx.update(grads, opt_state, params)
    params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)
    return params, opt_state


def jit_init(make_state, *args):
    """Build an initial train state in ONE compiled program.

    Eager state construction dispatches each distinct op (ortho-init QR per
    layer, env reset, optimizer zeros) as its own mini-compile; on a
    high-latency tunneled TPU backend that costs minutes (measured: 73s
    eager vs 13s single-jit for the 64-env nature-CNN PPO state).  Falls
    back to eager construction when the closure is untraceable (e.g. a
    host video-recorder reset) — loudly, because (a) for host-callback envs
    a partially-executed jitted init may already have reset env pools, and
    (b) a silent regression to the minutes-long eager path would otherwise
    be invisible."""
    try:
        made = jax.jit(make_state)(*args)
    except Exception as e:
        import warnings

        warnings.warn(
            f"jit_init fell back to eager state construction ({type(e).__name__}: "
            f"{e}); expect a slow init, and for host-callback envs a possible "
            "double env-pool reset",
            stacklevel=2,
        )
        made = make_state(*args)
    return dealias(made)


def dealias(tree):
    """Force every leaf to own its buffer.  Some envs return an obs array
    that IS a state field (e.g. identity envs), and donating a train state
    holding the same buffer twice is a runtime error; one explicit copy at
    state-creation time removes the aliasing."""
    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), tree)


class Model:
    """The uniform object returned by every `learn` (reference contract:
    run.py:76-81 expects .save; --play expects .step)."""

    def __init__(self, policy, state, extra=None):
        self.policy = policy
        self.state = state  # algorithm train-state pytree, .params field
        self.extra = extra or {}

    @property
    def params(self):
        return self.state.params

    def _set_params(self, params):
        """Install loaded params into the train state; subclasses with a
        composite .params view (HER) override both accessors."""
        self.state = self.state.replace(params=params)

    def initial_rnn_state(self, nenv: int):
        return self.policy.initial_state(nenv)

    def step(self, key, obs, rnn_state=None, done=None):
        mask = None
        if self.policy.is_recurrent:
            mask = (
                done.astype(jnp.float32)
                if done is not None
                else jnp.zeros((obs.shape[0],), jnp.float32)
            )
        return self.policy.step(self.params, key, obs, rnn_state, mask)

    def value(self, obs, rnn_state=None, done=None):
        mask = done.astype(jnp.float32) if done is not None else None
        return self.policy.value(self.params, obs, rnn_state, mask)

    def _normalize_state(self):
        """NormalizeState from the model's training env, if the env chain is
        normalized (VecNormalize stats live in env_state)."""
        from baselines_tpu.envs.vec import find_normalize_state

        return find_normalize_state(getattr(self.state, "env_state", None))

    def save(self, path):
        """--save_path payload: params PLUS VecNormalize running statistics
        when the training env was normalized, so a model replayed in a fresh
        process sees identically-scaled observations (fixes the
        README.md:117 wart the reference's use_tf=False mode has; DDPG
        reaches the same end by bundling rms into .params,
        ddpg_learner.py:102-111 analog)."""
        payload = {"model_params": self.params}
        ns = self._normalize_state()
        if ns is not None:
            payload["norm_ob_rms"] = ns.ob_rms
            payload["norm_ret_rms"] = ns.ret_rms
        ckpt.save_state(path, payload)

    def load(self, path):
        from flax import serialization

        from baselines_tpu.envs.vec import replace_normalize_stats

        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        if isinstance(raw, dict) and "model_params" in raw:
            params = serialization.from_state_dict(
                jax.device_get(self.params), raw["model_params"]
            )
            self._set_params(jax.device_put(params))
            ns = self._normalize_state()
            if "norm_ob_rms" in raw and ns is not None:
                ob_rms = serialization.from_state_dict(
                    jax.device_get(ns.ob_rms), raw["norm_ob_rms"]
                )
                ret_rms = serialization.from_state_dict(
                    jax.device_get(ns.ret_rms), raw["norm_ret_rms"]
                )
                self.state = self.state.replace(
                    env_state=replace_normalize_stats(
                        self.state.env_state, jax.device_put(ob_rms), jax.device_put(ret_rms)
                    )
                )
        else:  # legacy params-only checkpoint
            params = serialization.from_state_dict(jax.device_get(self.params), raw)
            self._set_params(jax.device_put(params))
        return self

    def save_full(self, path):
        ckpt.save_state(path, self.state)

    def load_full(self, path):
        self.state = ckpt.load_state(path, jax.device_get(self.state))
        return self


def evaluate(model: Model, venv, key, nsteps: int = 1000, deterministic: bool = True):
    """Roll the policy and report mean episode return (host-driven helper for
    tests / --play; the hot path stays jitted).

    If the model trained on a VecNormalize env and `venv` is also normalized,
    the trained running statistics are injected into the fresh env state so
    --play sees identically-scaled observations (run.py:222-244 analog minus
    the reference's lost-statistics wart)."""
    policy = model.policy
    trained_norm = model._normalize_state() if isinstance(model, Model) else None
    if trained_norm is not None:
        # walk the wrapper chain for a VecNormalize and seed it with the
        # trained statistics before the jitted reset traces
        w = venv
        while w is not None:
            if isinstance(w, VecNormalize):
                w._init_stats = (trained_norm.ob_rms, trained_norm.ret_rms)
                break
            w = getattr(w, "venv", None)

    @jax.jit
    def run(key):
        obs, env_state = venv.reset(key)
        rnn_state = policy.initial_state(venv.num_envs)
        done = jnp.zeros((venv.num_envs,), bool)

        def body(carry, _):
            key, env_state, obs, rnn_state, done = carry
            key, kact, kstep = jax.random.split(key, 3)
            mask = done.astype(jnp.float32)
            if deterministic:
                action, _, rnn_state2 = policy.mode_step(model.params, obs, rnn_state, mask)
            else:
                action, _, _, rnn_state2 = policy.step(model.params, kact, obs, rnn_state, mask)
            obs, env_state, rew, done, _ = venv.step(kstep, env_state, action)
            return (key, env_state, obs, rnn_state2, done), None

        (key, env_state, obs, rnn_state, done), _ = jax.lax.scan(
            body, (key, env_state, obs, rnn_state, done), None, length=nsteps
        )
        return VecMonitor.get_stats(env_state)

    stats = run(key)
    return float(stats.mean_return), float(stats.mean_length), int(stats.episodes)
