"""HER — hindsight experience replay over a DDPG core, parity with
baselines/her.

Parity map: episode rollouts of fixed horizon T with ε-random +
gaussian-noise exploration (her/rollout.py:50-136, get_actions noise_eps /
random_eps her/ddpg.py:170-184); episodic replay with 'future' relabeling
(her/replay_buffer.py, her/her_sampler.py — see data/her_buffer.py);
MPI-synchronized o/g normalizers (her/normalizer.py:10-118 → RunningMeanStd
with optional mesh axis sync); DDPG losses with target clipping to
[-1/(1-gamma), 0] (her/ddpg.py _create_network clip_return) and action_l2
penalty on the pre-scale actor output (her/ddpg.py pi_loss); polyak 0.95
target averaging; epoch structure n_cycles × (rollout + n_batches trains) +
target update (her/her.py:22-84).

TPU-native: every cycle — nenvs parallel T-step episode rollouts, episode
store, 40 relabeled-batch train steps, polyak — is one jitted computation;
relabeling is a gather/where kernel instead of per-sample host numpy.
"""

from __future__ import annotations

import time
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from baselines_tpu.algos.common import Model, build_env, dealias
from baselines_tpu.core import logger
from baselines_tpu.core.rng import seed_key
from baselines_tpu.core.running_stats import RunningMeanStd
from baselines_tpu.data.her_buffer import HerReplayBuffer
from baselines_tpu.envs.base import TimeLimit
from baselines_tpu.envs.registry import is_jax_env, make_env
from baselines_tpu.nn.networks import get_network


class GoalActor(nn.Module):
    network: Any
    nb_actions: int

    @nn.compact
    def __call__(self, o, g):
        x = jnp.concatenate([o, g], axis=-1)
        x = self.network(x)
        return jnp.tanh(nn.Dense(self.nb_actions, name="pi")(x))


class GoalCritic(nn.Module):
    network: Any

    @nn.compact
    def __call__(self, o, g, u):
        x = jnp.concatenate([o, g, u], axis=-1)
        x = self.network(x)
        return nn.Dense(1, name="output")(x)[..., 0]


@struct.dataclass
class HERTrainState:
    actor_params: Any
    critic_params: Any
    target_actor_params: Any
    target_critic_params: Any
    actor_opt: Any
    critic_opt: Any
    key: jax.Array
    buffer: Any
    o_rms: RunningMeanStd
    g_rms: RunningMeanStd
    n_episodes: jnp.ndarray
    success_rate: jnp.ndarray
    # host-env mode only: the live env stream carried across cycles (the
    # pure-JAX path resets fresh envs per cycle instead)
    env_state: Any = None
    obs: Any = None


# env-keyed parameter overrides (her/experiment/config.py:10-14); keyed by
# env id with the gymnasium version suffix stripped
DEFAULT_ENV_PARAMS = {
    "FetchReach": {"n_cycles": 10},
}


def _env_overrides(env_id: str | None) -> dict:
    if not env_id:
        return {}
    return DEFAULT_ENV_PARAMS.get(env_id.split("-v")[0], {})


def learn(
    *,
    env=None,
    env_id: str | None = None,
    network: str = "mlp",
    total_timesteps: int,
    seed: int | None = None,
    num_envs: int = 8,
    replay_k: float = 4,
    n_cycles: int | None = None,
    n_batches: int = 40,
    n_test_rollouts: int = 10,
    batch_size: int = 256,
    buffer_size_episodes: int = 10000,
    polyak: float = 0.95,
    gamma: float | None = None,
    q_lr: float = 1e-3,
    pi_lr: float = 1e-3,
    action_l2: float = 1.0,
    noise_eps: float = 0.2,
    random_eps: float = 0.3,
    norm_clip: float = 5.0,
    bc_loss: bool = False,
    q_filter: bool = False,
    demo_episodes=None,  # (o (E,T+1,do), ag (E,T+1,dg), g (E,T,dg), u (E,T,du))
    demo_batch_size: int = 128,
    prm_loss_weight: float = 0.001,
    aux_loss_weight: float = 0.0078,
    log_interval: int = 1,
    load_path: str | None = None,
    num_hidden: int = 256,
    num_layers: int = 3,
    mesh=None,
    env_kwargs: dict | None = None,  # accepted for CLI uniformity; goal envs
    # are pure-JAX and take no reward_scale/video flags (ref her pipeline
    # likewise bypasses cmd_util's wrapper chain, her/her.py:110-141)
    **network_kwargs,
) -> Model:
    """her.learn analog (her/her.py:87-177 + experiment/config.py DEFAULT_PARAMS:
    layers 3x256, pi_lr/q_lr 1e-3, polyak 0.95, replay_k 4, batch 256,
    n_cycles 50 (10 for FetchReach), n_batches 40, gamma = 1 - 1/T).

    Goal envs come in two flavors: pure-JAX registered envs (PointReach)
    rolled out with vmapped reset/step inside the jitted cycle, and host
    gymnasium-robotics envs (FetchReach & co.) driven through the
    io_callback bridge with dict observations — both with an independent
    evaluator env set rolled out without exploration noise each epoch
    (her/rollout.py evaluator + her/her.py:49-60)."""
    if n_cycles is None:
        n_cycles = _env_overrides(env_id).get("n_cycles", 50)
    host_mode = env is None and env_id is not None and not is_jax_env(env_id)

    if host_mode:
        from baselines_tpu.envs.callback_env import CallbackVecEnv
        from baselines_tpu.envs.gym_bridge import HostDummyVecEnv, HostSubprocVecEnv
        from baselines_tpu.envs.registry import get_env_type

        env_type = get_env_type(env_id)

        def thunk():
            import gymnasium as gym

            if env_type == "robotics":
                import gymnasium_robotics

                gym.register_envs(gymnasium_robotics)
            return gym.make(env_id)

        def make_pool(n):
            return (
                HostSubprocVecEnv([thunk] * n) if n > 1 else HostDummyVecEnv([thunk])
            )

        train_venv = CallbackVecEnv(make_pool(num_envs), info_keys=("is_success",))
        eval_venv = CallbackVecEnv(make_pool(num_envs), info_keys=("is_success",))
        probe = thunk()
        T = probe.spec.max_episode_steps
        uw = probe.unwrapped
        # reward recomputation for relabeled goals, in-graph
        # (her_sampler.py:52-56 calls env.compute_reward; gymnasium-robotics
        # goal envs use goal-distance thresholding)
        threshold = float(getattr(uw, "distance_threshold", 0.05))
        reward_type = getattr(uw, "reward_type", "sparse")
        probe.close()
        if reward_type == "sparse":
            def compute_reward(ag, g):
                d = jnp.linalg.norm(ag - g, axis=-1)
                return -(d > threshold).astype(jnp.float32)
        else:
            def compute_reward(ag, g):
                return -jnp.linalg.norm(ag - g, axis=-1)

        ob_space = train_venv.observation_space
        do = ob_space["observation"].shape[0]
        dg = ob_space["desired_goal"].shape[0]
        du = train_venv.action_space.shape[0]
        max_action = jnp.asarray(train_venv.action_space.high)
    else:
        wrapped = env if env is not None else make_env(env_id)
        assert isinstance(wrapped, TimeLimit), "HER needs a fixed-horizon goal env"
        T = wrapped.max_episode_steps
        base_env = wrapped.env
        assert hasattr(base_env, "compute_reward"), "HER env must expose compute_reward"
        compute_reward = base_env.compute_reward

        reset_v = jax.vmap(base_env.reset)
        step_v = jax.vmap(base_env.step)

        do = base_env.observation_space["observation"].shape[0]
        dg = base_env.observation_space["desired_goal"].shape[0]
        du = base_env.action_space.shape[0]
        max_action = jnp.asarray(base_env.action_space.high)

    if gamma is None:
        gamma = 1.0 - 1.0 / T
    clip_return = 1.0 / (1.0 - gamma)

    net_kwargs = dict(num_hidden=num_hidden, num_layers=num_layers, **network_kwargs)
    if network == "mlp":
        net_kwargs.setdefault("activation", jax.nn.relu)
    actor_net = GoalActor(get_network(network, **net_kwargs), du)
    critic_net = GoalCritic(get_network(network, **net_kwargs))

    key = seed_key(seed)
    key, ka, kc = jax.random.split(key, 3)
    o0 = jnp.zeros((1, do))
    g0 = jnp.zeros((1, dg))
    actor_params = actor_net.init(ka, o0, g0)
    critic_params = critic_net.init(kc, o0, g0, jnp.zeros((1, du)))
    actor_tx = optax.adam(pi_lr)
    critic_tx = optax.adam(q_lr)

    buffer = HerReplayBuffer(buffer_size_episodes, T, {"o": do, "g": dg, "u": du})

    # demonstration buffer (her/ddpg.py:107,160-215): a second episodic
    # buffer sampled alongside replay when bc_loss is on
    demo_buffer_state = None
    if bc_loss:
        assert demo_episodes is not None, "bc_loss requires demo_episodes"
        d_o, d_ag, d_g, d_u = demo_episodes
        n_demo = d_o.shape[0]
        demo_buffer = HerReplayBuffer(n_demo, T, {"o": do, "g": dg, "u": du})
        demo_buffer_state = demo_buffer.store_episodes(
            demo_buffer.init(), jax.random.PRNGKey(0),
            jnp.asarray(d_o), jnp.asarray(d_ag), jnp.asarray(d_g), jnp.asarray(d_u),
        )

    def norm(rms, x):
        return rms.normalize(x, clip=norm_clip)

    def pi(aparams, o_rms, g_rms, o, g):
        return actor_net.apply(aparams, norm(o_rms, o), norm(g_rms, g))

    def q(cparams, o_rms, g_rms, o, g, u):
        return critic_net.apply(cparams, norm(o_rms, o), norm(g_rms, g), u)

    def _episode_scan(key, env_state, obs, aparams, o_rms, g_rms, explore,
                      env_step=None):
        """T-step episode scan shared by trainer and evaluator; the
        evaluator runs the deterministic policy (her/rollout.py exploit
        mode: noise_eps=0, random_eps=0).  env_step: the host-mode step
        (train or evaluator pool)."""

        def step_fn(carry, _):
            key, env_state, obs = carry
            key, knoise, keps, krand, kstep = jax.random.split(key, 5)
            o, ag, g = obs["observation"], obs["achieved_goal"], obs["desired_goal"]
            u = pi(aparams, o_rms, g_rms, o, g)
            if explore:
                u = u + noise_eps * jax.random.normal(knoise, u.shape)
                u = jnp.clip(u, -1.0, 1.0)
                u_rand = jax.random.uniform(krand, u.shape, minval=-1.0, maxval=1.0)
                take_rand = jax.random.uniform(keps, (num_envs, 1)) < random_eps
                u = jnp.where(take_rand, u_rand, u)
            if host_mode:
                # host pool: episodes are horizon-aligned (goal envs never
                # terminate early, only truncate at T), so the auto-reset at
                # the scan's last step starts the next cycle's episodes; the
                # pre-reset final observation arrives as terminal_obs
                nobs, env_state_, rew, done, info = env_step(
                    kstep, env_state, max_action * u
                )
                final = info["terminal_obs"]
                out = {
                    "o": o, "ag": ag, "g": g, "u": u,
                    "success": info["is_success"],
                    "final_o": final["observation"],
                    "final_ag": final["achieved_goal"],
                }
                return (key, env_state_, nobs), out
            nobs, env_state_, rew, done, info = step_v(
                jax.random.split(kstep, num_envs), env_state, max_action * u
            )
            out = {
                "o": o, "ag": ag, "g": g, "u": u,
                "success": info["is_success"],
                "final_o": nobs["observation"],
                "final_ag": nobs["achieved_goal"],
            }
            return (key, env_state_, nobs), out

        return jax.lax.scan(step_fn, (key, env_state, obs), None, length=T)

    def rollout_episodes(state: HERTrainState):
        """nenvs parallel T-step episodes (her/rollout.py:50-136)."""
        key, kreset = jax.random.split(state.key)
        if host_mode:
            env_state, obs = state.env_state, state.obs
        else:
            obs, env_state = reset_v(jax.random.split(kreset, num_envs))
        (key, env_state, obs), tr = _episode_scan(
            key, env_state, obs, state.actor_params, state.o_rms, state.g_rms, True,
            env_step=train_venv.step if host_mode else None,
        )
        # episode arrays: o/ag get the final observation appended (T+1);
        # final_* at the last step is the true pre-reset observation
        o_seq = jnp.concatenate(
            [tr["o"], tr["final_o"][-1][None]], axis=0
        ).swapaxes(0, 1)  # (B, T+1, do)
        ag_seq = jnp.concatenate(
            [tr["ag"], tr["final_ag"][-1][None]], axis=0
        ).swapaxes(0, 1)
        g_seq = tr["g"].swapaxes(0, 1)
        u_seq = tr["u"].swapaxes(0, 1)
        success = tr["success"][-1].astype(jnp.float32).mean()
        return key, env_state, obs, o_seq, ag_seq, g_seq, u_seq, success

    def train_step(state: HERTrainState, _):
        key, ksample = jax.random.split(state.key)
        batch = buffer.sample(
            state.buffer, ksample, batch_size, replay_k, compute_reward
        )
        o, o2, g, u, r = batch["o"], batch["o2"], batch["g"], batch["u"], batch["r"]

        u2 = pi(state.target_actor_params, state.o_rms, state.g_rms, o2, g)
        q2 = q(state.target_critic_params, state.o_rms, state.g_rms, o2, g, u2)
        target = jnp.clip(r + gamma * q2, -clip_return, 0.0)  # her/ddpg.py target clip
        target = jax.lax.stop_gradient(target)

        def closs(cp):
            return jnp.mean(jnp.square(q(cp, state.o_rms, state.g_rms, o, g, u) - target))

        cgrads = jax.grad(closs)(state.critic_params)
        cupd, critic_opt = critic_tx.update(cgrads, state.critic_opt, state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, cupd)

        if bc_loss:
            kdemo = jax.random.fold_in(key, 777)
            demo = demo_buffer.sample(
                demo_buffer_state, kdemo, demo_batch_size, 0.0, compute_reward
            )  # replay_k=0: keep original goals for demos

        def aloss(ap):
            a = pi(ap, state.o_rms, state.g_rms, o, g)
            main = -jnp.mean(
                q(critic_params, state.o_rms, state.g_rms, o, g, a)
            ) + action_l2 * jnp.mean(jnp.square(a))
            if not bc_loss:
                return main
            # behavior cloning on demos with optional Q-filter
            # (her/ddpg.py:361-377): imitate only where the critic thinks
            # the demo action beats the actor's
            a_demo = pi(ap, state.o_rms, state.g_rms, demo["o"], demo["g"])
            if q_filter:
                q_demo = q(critic_params, state.o_rms, state.g_rms,
                           demo["o"], demo["g"], demo["u"])
                q_actor = q(critic_params, state.o_rms, state.g_rms,
                            demo["o"], demo["g"], a_demo)
                mask = (q_demo > q_actor).astype(jnp.float32)[:, None]
            else:
                mask = 1.0
            cloning = jnp.sum(jnp.square((a_demo - demo["u"]) * mask))
            return prm_loss_weight * main + aux_loss_weight * cloning

        agrads = jax.grad(aloss)(state.actor_params)
        aupd, actor_opt = actor_tx.update(agrads, state.actor_opt, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, aupd)

        state = state.replace(
            key=key,
            actor_params=actor_params,
            critic_params=critic_params,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
        )
        return state, None

    def cycle_fn(state: HERTrainState):
        key, env_state, obs, o_seq, ag_seq, g_seq, u_seq, success = rollout_episodes(
            state
        )
        if host_mode:
            state = state.replace(env_state=env_state, obs=obs)
        key, kstore = jax.random.split(key)
        buf = buffer.store_episodes(state.buffer, kstore, o_seq, ag_seq, g_seq, u_seq)
        # normalizer updates from the new episodes (her/ddpg.py:217-240)
        o_rms = state.o_rms.update(o_seq.reshape(-1, do))
        g_rms = state.g_rms.update(
            jnp.concatenate([g_seq.reshape(-1, dg), ag_seq.reshape(-1, dg)], axis=0)
        )
        state = state.replace(
            key=key,
            buffer=buf,
            o_rms=o_rms,
            g_rms=g_rms,
            n_episodes=state.n_episodes + num_envs,
            success_rate=0.9 * state.success_rate + 0.1 * success,
        )
        state, _ = jax.lax.scan(train_step, state, None, length=n_batches)
        # polyak target update once per cycle (her/her.py:46)
        state = state.replace(
            target_actor_params=jax.tree_util.tree_map(
                lambda t, p: polyak * t + (1 - polyak) * p,
                state.target_actor_params, state.actor_params,
            ),
            target_critic_params=jax.tree_util.tree_map(
                lambda t, p: polyak * t + (1 - polyak) * p,
                state.target_critic_params, state.critic_params,
            ),
        )
        return state

    init_env_state = init_obs = None
    if host_mode:
        key, ktr = jax.random.split(key)
        init_obs, init_env_state = train_venv.reset(ktr)

    state = dealias(
        HERTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_actor_params=actor_params,
            target_critic_params=critic_params,
            actor_opt=actor_tx.init(actor_params),
            critic_opt=critic_tx.init(critic_params),
            key=key,
            buffer=buffer.init(),
            o_rms=RunningMeanStd.create((do,)),
            g_rms=RunningMeanStd.create((dg,)),
            n_episodes=jnp.zeros((), jnp.int32),
            success_rate=jnp.zeros(()),
            env_state=init_env_state,
            obs=init_obs,
        )
    )
    if mesh is not None:
        from baselines_tpu.distributed.mesh import shard_train_state

        state = shard_train_state(mesh, state, num_envs)

    cycle = jax.jit(cycle_fn, donate_argnums=0)

    # -- evaluator: separate rollouts without exploration noise, reporting
    # the epoch test/success_rate (her/rollout.py evaluator settings +
    # her/her.py:49-60).  Host mode keeps a dedicated env pool whose stream
    # is carried across epochs; the pure-JAX path resets fresh episodes.
    if host_mode:
        def eval_fn(aparams, o_rms, g_rms, key, env_state, obs):
            (key, env_state, obs), tr = _episode_scan(
                key, env_state, obs, aparams, o_rms, g_rms, False,
                env_step=eval_venv.step,
            )
            return tr["success"][-1].astype(jnp.float32).mean(), env_state, obs

        eval_jit = jax.jit(eval_fn)
        _obs0, _es0 = eval_venv.reset(jax.random.fold_in(key, 424242))
        eval_carry = (_es0, _obs0)

        def run_eval(state, ekey):
            nonlocal eval_carry
            total, rounds = 0.0, max(1, -(-n_test_rollouts // num_envs))
            for r in range(rounds):
                s, es, ob = eval_jit(
                    state.actor_params, state.o_rms, state.g_rms,
                    jax.random.fold_in(ekey, r), *eval_carry,
                )
                eval_carry = (es, ob)
                total += float(s)
            return total / rounds
    else:
        def eval_fn(aparams, o_rms, g_rms, key):
            kreset, kscan = jax.random.split(key)
            obs, env_state = reset_v(jax.random.split(kreset, num_envs))
            (_, _, _), tr = _episode_scan(
                kscan, env_state, obs, aparams, o_rms, g_rms, False
            )
            return tr["success"][-1].astype(jnp.float32).mean()

        eval_jit = jax.jit(eval_fn)

        def run_eval(state, ekey):
            rounds = max(1, -(-n_test_rollouts // num_envs))
            return sum(
                float(eval_jit(state.actor_params, state.o_rms, state.g_rms,
                               jax.random.fold_in(ekey, r)))
                for r in range(rounds)
            ) / rounds

    class HERPolicy:
        is_recurrent = False

        def initial_state(self, batch_size):
            return None

        def step(self, params, key, obs, rnn_state=None, rnn_mask=None):
            a = pi(params["actor"], params["o_rms"], params["g_rms"],
                   obs["observation"], obs["desired_goal"])
            return max_action * a, None, None, None

        def mode_step(self, params, obs, rnn_state=None, rnn_mask=None):
            a = pi(params["actor"], params["o_rms"], params["g_rms"],
                   obs["observation"], obs["desired_goal"])
            return max_action * a, None, None

    class HERModel(Model):
        @property
        def params(self):
            return {
                "actor": self.state.actor_params,
                "o_rms": self.state.o_rms,
                "g_rms": self.state.g_rms,
            }

        def _set_params(self, params):
            self.state = self.state.replace(
                actor_params=params["actor"],
                o_rms=params["o_rms"],
                g_rms=params["g_rms"],
            )

    model = HERModel(HERPolicy(), state)
    if load_path is not None:
        model.load(load_path)  # --save_path payload (actor + normalizers)
        state = model.state

    steps_per_epoch = n_cycles * num_envs * T
    n_epochs = max(total_timesteps // steps_per_epoch, 1) if total_timesteps > 0 else 0

    # resolved-parameter dump (her/experiment/config.py log_params +
    # her/her.py:126): everything a rerun needs, as params.json in the logdir
    if logger.get_dir():
        import json
        import os.path as osp

        params = dict(
            env_id=env_id, network=network, T=T, num_envs=num_envs,
            replay_k=replay_k, n_cycles=n_cycles, n_batches=n_batches,
            n_test_rollouts=n_test_rollouts, batch_size=batch_size,
            buffer_size_episodes=buffer_size_episodes, polyak=polyak,
            gamma=gamma, q_lr=q_lr, pi_lr=pi_lr, action_l2=action_l2,
            noise_eps=noise_eps, random_eps=random_eps, norm_clip=norm_clip,
            bc_loss=bc_loss, q_filter=q_filter,
            demo_batch_size=demo_batch_size, prm_loss_weight=prm_loss_weight,
            aux_loss_weight=aux_loss_weight, num_hidden=num_hidden,
            num_layers=num_layers, seed=seed, total_timesteps=total_timesteps,
            n_epochs=n_epochs,
        )
        with open(osp.join(logger.get_dir(), "params.json"), "w") as f:
            json.dump(params, f, indent=2, sort_keys=True)

    eval_key = jax.random.fold_in(seed_key(seed), 999)
    tstart = time.time()
    for epoch in range(n_epochs):
        for _ in range(n_cycles):
            state = cycle(state)
        test_success = run_eval(state, jax.random.fold_in(eval_key, epoch))
        if log_interval and epoch % log_interval == 0:
            logger.logkv("epoch", epoch)
            logger.logkv("train/episode", int(state.n_episodes))
            logger.logkv("train/success_rate", float(state.success_rate))
            logger.logkv("test/success_rate", test_success)
            logger.logkv("total/steps", (epoch + 1) * steps_per_epoch)
            logger.logkv(
                "steps_per_second",
                int((epoch + 1) * steps_per_epoch / (time.time() - tstart)),
            )
            logger.dumpkvs()
    if host_mode:
        train_venv.close()
        eval_venv.close()
    model.state = state
    return model
