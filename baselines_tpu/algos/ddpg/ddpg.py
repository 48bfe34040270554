"""DDPG — deterministic actor-critic, parity with baselines/ddpg.

Agent parity (ddpg/ddpg_learner.py:66-397): tanh actor scaled to the action
range (ddpg/models.py:24-33), critic over concat(obs, action) with an
'output' head (models.py:37-48), Polyak-averaged target networks with tau
(ddpg_learner.py:36-47,149-153), observation normalization via running
mean/std (:102-111), popart return renormalization rescaling the critic
output layer (:205-221), critic L2 regularization on non-output kernels
(:187-196), OU/normal action noise and adaptive parameter noise with an
action-space distance criterion (:155-170, 362-387, ddpg/noise.py).

Loop parity (ddpg/ddpg.py:21-275): epochs × cycles × (nb_rollout_steps env
steps, then nb_train_steps batched updates + target polyak); actor_lr 1e-4 /
critic_lr 1e-3 Adam; reward_scale.

TPU-native structure: one jitted `cycle` = rollout scan + train scan; the
replay memory (ddpg/memory.py's five RingBuffers) is the generic HBM pytree
ring (data/replay.py); MPI allreduces around MpiAdam and the distance/stat
means (ddpg_learner.py:381-387) become mesh collectives (dp-sharded batch →
XLA all-reduce inside grad means).
"""

from __future__ import annotations

import time
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from baselines_tpu.algos.common import Model, build_env, dealias
from baselines_tpu.algos.ddpg.noise import (
    adapt_param_noise_stddev,
    parse_noise_type,
    perturb_params,
)
from baselines_tpu.core import checkpoint as ckpt
from baselines_tpu.core import logger
from baselines_tpu.core.rng import seed_key
from baselines_tpu.core.running_stats import RunningMeanStd
from baselines_tpu.data.replay import ReplayBuffer
from baselines_tpu.envs.spaces import Box
from baselines_tpu.envs.vec import VecMonitor
from baselines_tpu.nn.networks import get_network

uniform_init = nn.initializers.uniform  # scaled below to match ±3e-3


def _final_init():
    # tf.random_uniform_initializer(-3e-3, 3e-3) (ddpg/models.py:31,46)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -3e-3, 3e-3)

    return init


class Actor(nn.Module):
    network: Any
    nb_actions: int

    @nn.compact
    def __call__(self, obs):
        x = self.network(obs)
        x = nn.Dense(self.nb_actions, kernel_init=_final_init(), name="pi")(x)
        return jnp.tanh(x)


class Critic(nn.Module):
    network: Any

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        x = self.network(x)
        return nn.Dense(1, kernel_init=_final_init(), name="output")(x)[..., 0]


@struct.dataclass
class DDPGTrainState:
    actor_params: Any
    critic_params: Any
    target_actor_params: Any
    target_critic_params: Any
    actor_opt: Any
    critic_opt: Any
    key: jax.Array
    env_state: Any
    obs: Any
    replay: Any
    obs_rms: RunningMeanStd
    ret_rms: RunningMeanStd
    action_noise_state: jnp.ndarray
    param_noise_stddev: jnp.ndarray
    perturbed_actor_params: Any
    t: jnp.ndarray


def _popart_rescale(critic_params, old_mean, old_std, new_mean, new_std):
    """Rescale the critic 'output' layer so the DENORMALIZED prediction is
    invariant under the ret_rms change (ddpg_learner.py:205-221)."""
    p = jax.tree_util.tree_map(lambda x: x, critic_params)  # shallow copy
    out = p["params"]["output"]
    kernel = out["kernel"] * old_std / new_std
    bias = (out["bias"] * old_std + old_mean - new_mean) / new_std
    p["params"] = dict(p["params"])
    p["params"]["output"] = {"kernel": kernel, "bias": bias}
    return p


def learn(
    *,
    env=None,
    env_id: str | None = None,
    network: str = "mlp",
    total_timesteps: int | None = None,
    seed: int | None = None,
    num_envs: int = 1,
    env_kwargs: dict | None = None,
    nb_epochs: int | None = None,
    nb_epoch_cycles: int = 20,
    nb_rollout_steps: int = 100,
    nb_train_steps: int = 50,
    reward_scale: float = 1.0,
    noise_type: str = "adaptive-param_0.2",
    normalize_returns: bool = False,
    normalize_observations: bool = True,
    critic_l2_reg: float = 1e-2,
    actor_lr: float = 1e-4,
    critic_lr: float = 1e-3,
    gamma: float = 0.99,
    clip_norm: float | None = None,
    batch_size: int = 64,
    tau: float = 0.01,
    buffer_size: int = 10**6,
    param_noise_adaption_interval: int = 50,
    log_interval: int = 1,
    load_path: str | None = None,
    mesh=None,
    **network_kwargs,
) -> Model:
    """ddpg.learn analog (ddpg/ddpg.py:21-275 signature/defaults)."""
    venv = env if env is not None else build_env(env_id, num_envs, normalize=False, **(env_kwargs or {}))
    nenvs = venv.num_envs
    assert isinstance(venv.action_space, Box)
    nb_actions = venv.action_space.shape[-1]
    max_action = jnp.asarray(venv.action_space.high)

    if total_timesteps is not None and nb_epochs is None:
        # total_timesteps=0 means "no training" (load/play contract, run.py:218-244)
        nb_epochs = (
            max(1, int(total_timesteps) // (nb_epoch_cycles * nb_rollout_steps * nenvs))
            if total_timesteps > 0
            else 0
        )
    nb_epochs = 500 if nb_epochs is None else nb_epochs

    actor_net = Actor(get_network(network, **network_kwargs), nb_actions)
    critic_net = Critic(get_network(network, **network_kwargs))
    action_noise, param_noise_std0 = parse_noise_type(noise_type, nb_actions)
    use_param_noise = param_noise_std0 is not None

    actor_tx = optax.chain(
        *( [optax.clip_by_global_norm(clip_norm)] if clip_norm else [] ),
        optax.scale_by_adam(eps=1e-8),
    )
    critic_tx = optax.chain(
        *( [optax.clip_by_global_norm(clip_norm)] if clip_norm else [] ),
        optax.scale_by_adam(eps=1e-8),
    )

    rb = ReplayBuffer(buffer_size)

    def norm_obs(rms, o):
        if not normalize_observations:
            return jnp.asarray(o, jnp.float32)
        return rms.normalize(o, clip=5.0)

    def actor_action(params, rms, o):
        return actor_net.apply(params, norm_obs(rms, o))

    def critic_q(params, rms, o, a, ret_rms, denorm):
        q = critic_net.apply(params, norm_obs(rms, o), a)
        if normalize_returns and denorm:
            q = ret_rms.denormalize(q)
        return q

    def critic_loss_fn(cparams, state, batch, target_q_norm):
        q = critic_net.apply(cparams, norm_obs(state.obs_rms, batch["obs"]), batch["action"])
        loss = jnp.mean(jnp.square(q - target_q_norm))
        if critic_l2_reg > 0:
            # l2 on non-output kernels (ddpg_learner.py:187-196)
            leaves = jax.tree_util.tree_flatten_with_path(cparams)[0]
            reg = sum(
                jnp.sum(jnp.square(leaf))
                for path, leaf in leaves
                if "output" not in str(path) and "kernel" in str(path[-1])
            )
            loss = loss + critic_l2_reg * reg
        return loss

    def rollout_step(carry, _):
        state = carry
        key, kstep, knoise = jax.random.split(state.key, 3)
        if use_param_noise:
            a = actor_action(state.perturbed_actor_params, state.obs_rms, state.obs)
            noise_state = state.action_noise_state
        elif action_noise is not None:
            a = actor_action(state.actor_params, state.obs_rms, state.obs)
            noise, noise_state = action_noise.sample(knoise, state.action_noise_state)
            a = a + noise
        else:
            a = actor_action(state.actor_params, state.obs_rms, state.obs)
            noise_state = state.action_noise_state
        a = jnp.clip(a, -1.0, 1.0)
        env_action = max_action * a  # scale to env range (ddpg.py:137-139)
        nobs, env_state, rew, done, info = venv.step(kstep, state.env_state, env_action)
        rew = rew * reward_scale
        transition = {
            "obs": state.obs,
            "action": a,
            "reward": rew,
            "next_obs": info["terminal_obs"],
            "done": done.astype(jnp.float32),
        }
        replay = rb.add_batch(state.replay, transition)
        obs_rms = state.obs_rms.update(state.obs) if normalize_observations else state.obs_rms
        noise_state = jnp.where(done[:, None], 0.0, noise_state)  # noise.reset() on done
        state = state.replace(
            key=key, env_state=env_state, obs=nobs, replay=replay,
            obs_rms=obs_rms, action_noise_state=noise_state, t=state.t + nenvs,
        )
        return state, None

    def train_step(carry, step_idx):
        state = carry
        key, ksample, kperturb, kadapt = jax.random.split(state.key, 4)
        batch, _ = rb.sample(state.replay, ksample, batch_size)

        # target Q (denormalized space)
        next_a = actor_action(state.target_actor_params, state.obs_rms, batch["next_obs"])
        q_next = critic_q(
            state.target_critic_params, state.obs_rms, batch["next_obs"], next_a,
            state.ret_rms, denorm=True,
        )
        target_q = batch["reward"] + gamma * (1.0 - batch["done"]) * q_next

        ret_rms = state.ret_rms
        critic_params = state.critic_params
        target_critic_params = state.target_critic_params
        if normalize_returns:
            old_mean, old_std = ret_rms.mean, jnp.sqrt(ret_rms.var + 1e-8)
            ret_rms = ret_rms.update(target_q)
            new_mean, new_std = ret_rms.mean, jnp.sqrt(ret_rms.var + 1e-8)
            critic_params = _popart_rescale(critic_params, old_mean, old_std, new_mean, new_std)
            target_critic_params = _popart_rescale(
                target_critic_params, old_mean, old_std, new_mean, new_std
            )
            target_q_norm = (target_q - new_mean) / new_std
        else:
            target_q_norm = target_q

        cgrads = jax.grad(critic_loss_fn)(critic_params, state, batch, target_q_norm)
        cupdates, critic_opt = critic_tx.update(cgrads, state.critic_opt, critic_params)
        critic_params = jax.tree_util.tree_map(
            lambda p, u: p - critic_lr * u, critic_params, cupdates
        )

        def aloss(aparams):
            a = actor_action(aparams, state.obs_rms, batch["obs"])
            q = critic_q(critic_params, state.obs_rms, batch["obs"], a, ret_rms, denorm=True)
            return -jnp.mean(q)

        agrads = jax.grad(aloss)(state.actor_params)
        aupdates, actor_opt = actor_tx.update(agrads, state.actor_opt, state.actor_params)
        actor_params = jax.tree_util.tree_map(
            lambda p, u: p - actor_lr * u, state.actor_params, aupdates
        )

        # polyak targets (ddpg_learner.py:149-153)
        target_actor_params = jax.tree_util.tree_map(
            lambda t, p: (1 - tau) * t + tau * p, state.target_actor_params, actor_params
        )
        target_critic_params = jax.tree_util.tree_map(
            lambda t, p: (1 - tau) * t + tau * p, target_critic_params, critic_params
        )

        # adaptive param noise every param_noise_adaption_interval train steps
        param_noise_stddev = state.param_noise_stddev
        perturbed = state.perturbed_actor_params
        if use_param_noise:
            def adapt(args):
                stddev, perturbed = args
                test_perturbed = perturb_params(kadapt, actor_params, stddev)
                a0 = actor_action(actor_params, state.obs_rms, batch["obs"])
                a1 = actor_action(test_perturbed, state.obs_rms, batch["obs"])
                distance = jnp.sqrt(jnp.mean(jnp.square(a0 - a1)))
                stddev = adapt_param_noise_stddev(stddev, distance, param_noise_std0)
                return stddev, perturbed

            param_noise_stddev, perturbed = jax.lax.cond(
                step_idx % param_noise_adaption_interval == 0,
                adapt,
                lambda args: args,
                (param_noise_stddev, perturbed),
            )

        state = state.replace(
            key=key,
            actor_params=actor_params,
            critic_params=critic_params,
            target_actor_params=target_actor_params,
            target_critic_params=target_critic_params,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            ret_rms=ret_rms,
            param_noise_stddev=param_noise_stddev,
            perturbed_actor_params=perturbed,
        )
        return state, None

    def cycle_fn(state: DDPGTrainState):
        # re-perturb actor at cycle start (ddpg.py:150-156 agent.reset())
        if use_param_noise:
            key, kp = jax.random.split(state.key)
            state = state.replace(
                key=key,
                perturbed_actor_params=perturb_params(
                    kp, state.actor_params, state.param_noise_stddev
                ),
            )
        state, _ = jax.lax.scan(rollout_step, state, None, length=nb_rollout_steps)
        can_train = state.replay.size >= batch_size

        def do_trains(state):
            state, _ = jax.lax.scan(
                train_step, state, jnp.arange(nb_train_steps), length=nb_train_steps
            )
            return state

        state = jax.lax.cond(can_train, do_trains, lambda s: s, state)
        return state

    def make_state(key):
        key, kreset, ka, kc = jax.random.split(key, 4)
        obs, env_state = venv.reset(kreset)
        obs_dim_sample = obs[:1]
        actor_params = actor_net.init(ka, obs_dim_sample)
        critic_params = critic_net.init(kc, obs_dim_sample, jnp.zeros((1, nb_actions)))
        sample_item = {
            "obs": obs[0],
            "action": jnp.zeros((nb_actions,), jnp.float32),
            "reward": jnp.zeros((), jnp.float32),
            "next_obs": obs[0],
            "done": jnp.zeros((), jnp.float32),
        }
        return DDPGTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_actor_params=actor_params,
            target_critic_params=critic_params,
            actor_opt=actor_tx.init(actor_params),
            critic_opt=critic_tx.init(critic_params),
            key=key,
            env_state=env_state,
            obs=obs,
            replay=rb.init(sample_item),
            obs_rms=RunningMeanStd.create(obs.shape[1:]),
            ret_rms=RunningMeanStd.create(()),
            action_noise_state=(
                action_noise.init_state(nenvs)
                if action_noise is not None
                else jnp.zeros((nenvs, nb_actions), jnp.float32)
            ),
            param_noise_stddev=jnp.asarray(param_noise_std0 or 0.0, jnp.float32),
            perturbed_actor_params=actor_params,
            t=jnp.zeros((), jnp.int32),
        )

    from baselines_tpu.algos.common import jit_init

    state = jit_init(make_state, seed_key(seed))
    if mesh is not None:
        from baselines_tpu.distributed.mesh import shard_train_state

        state = shard_train_state(mesh, state, nenvs)

    cycle = jax.jit(cycle_fn, donate_argnums=0)

    class DDPGPolicy:
        """Deterministic-policy surface for Model/evaluate."""

        is_recurrent = False

        def initial_state(self, batch_size):
            return None

        def step(self, params, key, o, rnn_state=None, rnn_mask=None):
            a = actor_action(params["actor"], params["obs_rms"], o)
            return max_action * a, None, None, None

        def mode_step(self, params, o, rnn_state=None, rnn_mask=None):
            a = actor_action(params["actor"], params["obs_rms"], o)
            return max_action * a, None, None

        def value(self, params, o, rnn_state=None, rnn_mask=None):
            a = actor_action(params["actor"], params["obs_rms"], o)
            return critic_q(params["critic"], params["obs_rms"], o, a, params["ret_rms"], True)

    class DDPGModel(Model):
        @property
        def params(self):
            return {
                "actor": self.state.actor_params,
                "critic": self.state.critic_params,
                "obs_rms": self.state.obs_rms,
                "ret_rms": self.state.ret_rms,
            }

        # DDPG's train state is not a params-field pytree; checkpoint the
        # policy-relevant variables (actor/critic/targets/normalizers) —
        # the reference's save_variables saves all of these (tf_util.py:345-372)
        def _ckpt_tree(self):
            return {
                "actor": self.state.actor_params,
                "critic": self.state.critic_params,
                "target_actor": self.state.target_actor_params,
                "target_critic": self.state.target_critic_params,
                "obs_rms": self.state.obs_rms,
                "ret_rms": self.state.ret_rms,
            }

        def save(self, path):
            ckpt.save_state(path, self._ckpt_tree())

        def load(self, path):
            new = ckpt.load_state(path, jax.device_get(self._ckpt_tree()))
            self.state = self.state.replace(
                actor_params=jax.device_put(new["actor"]),
                critic_params=jax.device_put(new["critic"]),
                target_actor_params=jax.device_put(new["target_actor"]),
                target_critic_params=jax.device_put(new["target_critic"]),
                obs_rms=jax.device_put(new["obs_rms"]),
                ret_rms=jax.device_put(new["ret_rms"]),
            )
            return self

    model = DDPGModel(DDPGPolicy(), state)
    if load_path is not None:
        model.load(load_path)
        state = model.state

    tstart = time.time()
    total_cycles = nb_epochs * nb_epoch_cycles
    for epoch in range(nb_epochs):
        for c in range(nb_epoch_cycles):
            state = cycle(state)
        if log_interval and (epoch % log_interval == 0):
            stats = VecMonitor.get_stats(state.env_state)
            logger.logkv("epoch", epoch)
            logger.logkv("total/steps", int(state.t))
            logger.logkv("rollout/return_history", float(stats.mean_return))
            logger.logkv("total/epochs", epoch + 1)
            logger.logkv("total/steps_per_second", int(int(state.t) / (time.time() - tstart)))
            if use_param_noise:
                logger.logkv("param_noise_stddev", float(state.param_noise_stddev))
            logger.dumpkvs()
    model.state = state
    return model
