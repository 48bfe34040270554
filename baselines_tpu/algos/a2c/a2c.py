"""A2C — synchronous advantage actor-critic, parity with baselines/a2c.

Loss parity (a2c/a2c.py:54-86): pg_loss = E[(R - V)·(-logπ(a))] with the
advantage NOT normalized, vf_loss = MSE(V, R), entropy bonus; RMSProp with
decay 0.99, eps 1e-5 (:88-93); n-step bootstrapped returns
(a2c/runner.py:58-69 via discount_with_dones); one gradient step per rollout
batch; optional linear LR annealing (a2c/utils.py:161-211 Scheduler).

TPU-native structure: rollout scan + return scan + the single SGD step fuse
into one jitted update (the reference does nsteps sess.run round-trips per
batch plus one train sess.run, a2c/runner.py:28-56, a2c.py:101-116).
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from baselines_tpu.algos.common import (
    Model,
    apply_updates_lr,
    build_env,
    dealias,
    run_rollout,
)
from baselines_tpu.core import logger
from baselines_tpu.core.math import explained_variance
from baselines_tpu.core.rng import seed_key
from baselines_tpu.data.gae import nstep_returns
from baselines_tpu.envs.vec import VecMonitor
from baselines_tpu.nn.policy import build_policy


@struct.dataclass
class A2CTrainState:
    params: Any
    opt_state: Any
    key: jax.Array
    env_state: Any
    obs: Any
    rnn_state: Any
    last_done: jnp.ndarray
    update_idx: jnp.ndarray


def _flat01(x):
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def learn(
    *,
    env=None,
    env_id: str | None = None,
    network: str = "mlp",
    total_timesteps: int,
    seed: int | None = None,
    num_envs: int = 8,
    env_kwargs: dict | None = None,
    nsteps: int = 5,
    vf_coef: float = 0.5,
    ent_coef: float = 0.01,
    max_grad_norm: float = 0.5,
    lr: float = 7e-4,
    lrschedule: str = "linear",
    epsilon: float = 1e-5,
    alpha: float = 0.99,
    gamma: float = 0.99,
    log_interval: int = 100,
    load_path: str | None = None,
    value_network: str | None = None,
    mesh=None,
    **network_kwargs,
) -> Model:
    """a2c.learn analog (a2c/a2c.py:119-231 signature/defaults)."""
    venv = env if env is not None else build_env(env_id, num_envs, **(env_kwargs or {}))
    nenvs = venv.num_envs
    nbatch = nenvs * nsteps
    nupdates = max(total_timesteps // nbatch, 1) if total_timesteps > 0 else 0

    policy = build_policy(
        venv.observation_space, venv.action_space, network,
        value_network=value_network, **network_kwargs,
    )

    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_rms(decay=alpha, eps=epsilon),
    )
    recurrent = policy.is_recurrent

    def loss_fn(params, traj, returns, rnn_init):
        if recurrent:

            def step(rnn, x):
                obs_t, mask_t = x
                pdflat_t, vf_t, rnn = policy.apply(params, obs_t, rnn, mask_t)
                return rnn, (pdflat_t, vf_t)

            _, (pdflat, vpred) = jax.lax.scan(step, rnn_init, (traj.obs, traj.rnn_masks))
            pdflat, vpred = _flat01(pdflat), _flat01(vpred)
        else:
            pdflat, vpred, _ = policy.apply(params, _flat01(traj.obs))
        pd = policy.pdtype.pdfromflat(pdflat)
        actions = _flat01(traj.actions)
        R = _flat01(returns)
        adv = R - _flat01(traj.values)  # computed from behavior values (a2c.py:102)
        neglogpac = pd.neglogp(actions)
        pg_loss = jnp.mean(adv * neglogpac)
        vf_loss = jnp.mean(jnp.square(vpred - R))
        entropy = jnp.mean(pd.entropy())
        loss = pg_loss - entropy * ent_coef + vf_loss * vf_coef
        return loss, {
            "policy_loss": pg_loss,
            "value_loss": vf_loss,
            "policy_entropy": entropy,
        }

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def update_fn(state: A2CTrainState):
        frac = 1.0 - state.update_idx.astype(jnp.float32) / nupdates
        lr_now = jnp.float32(lr) * (frac if lrschedule == "linear" else 1.0)

        rollout_init_rnn = state.rnn_state
        key, env_state, obs, rnn_state, last_done, traj, last_value = run_rollout(
            policy, venv, state.params, state.key, state.env_state, state.obs,
            state.rnn_state, state.last_done, nsteps,
        )
        returns = nstep_returns(traj.rewards, traj.dones, last_value, gamma)
        (loss, metrics), grads = grad_fn(state.params, traj, returns, rollout_init_rnn)
        params, opt_state = apply_updates_lr(tx, state.params, state.opt_state, grads, lr_now)
        metrics["explained_variance"] = explained_variance(
            _flat01(traj.values), _flat01(returns)
        )
        new_state = A2CTrainState(
            params=params,
            opt_state=opt_state,
            key=key,
            env_state=env_state,
            obs=obs,
            rnn_state=rnn_state,
            last_done=last_done,
            update_idx=state.update_idx + 1,
        )
        return new_state, metrics

    def make_state(key):
        key, kreset, kinit = jax.random.split(key, 3)
        obs, env_state = venv.reset(kreset)
        params = policy.init(kinit, obs)
        return A2CTrainState(
            params=params,
            opt_state=tx.init(params),
            key=key,
            env_state=env_state,
            obs=obs,
            rnn_state=policy.initial_state(nenvs),
            last_done=jnp.zeros((nenvs,), bool),
            update_idx=jnp.zeros((), jnp.int32),
        )

    from baselines_tpu.algos.common import jit_init

    state = jit_init(make_state, seed_key(seed))
    if mesh is not None:
        from baselines_tpu.distributed.mesh import shard_train_state

        state = shard_train_state(mesh, state, nenvs)

    update = jax.jit(update_fn, donate_argnums=0)
    model = Model(policy, state)
    if load_path is not None:
        model.load(load_path)
        state = model.state

    tstart = time.time()
    for upd in range(1, nupdates + 1):
        state, metrics = update(state)
        if upd % log_interval == 0 or upd == 1:
            metrics = jax.device_get(metrics)
            stats = VecMonitor.get_stats(state.env_state)
            logger.logkv("nupdates", upd)
            logger.logkv("total_timesteps", upd * nbatch)
            logger.logkv("fps", int(upd * nbatch / (time.time() - tstart)))
            logger.logkv("eprewmean", float(stats.mean_return))
            for k, v in metrics.items():
                logger.logkv(k, float(v))
            logger.dumpkvs()
    model.state = state
    return model
