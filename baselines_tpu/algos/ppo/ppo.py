"""PPO (clipped surrogate) — parity with baselines/ppo2.

Loss parity: ppo2/model.py:46-116 — clipped value loss (:69-75), clipped
ratio surrogate (:78-88), entropy bonus, approxkl/clipfrac diagnostics;
advantages normalized PER MINIBATCH (model.py:136-139).  Training schedule
parity: ppo2/ppo2.py:21-218 — noptepochs × nminibatches shuffled SGD with
LR/cliprange annealed by remaining fraction (:133-137), recurrent policies
minibatched by whole-env trajectory chunks (:167-180).

TPU-native structure: ONE jitted `update` contains the entire iteration —
the T-step rollout scan, GAE, and every optimizer epoch/minibatch as nested
``lax.scan``s — where the reference crosses host↔device per env step and per
minibatch feed_dict (ppo2/runner.py:29-40, model.py:140-158).  Data
parallelism: shard the env axis of the train state over a mesh; XLA turns
the minibatch gradient mean into an ICI all-reduce, replacing
MpiAdamOptimizer's host Allreduce (mpi_adam_optimizer.py:39-46).
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from baselines_tpu.algos.common import (
    Model,
    adam_optimizer,
    apply_updates_lr,
    build_env,
    run_rollout,
)
from baselines_tpu.core import logger
from baselines_tpu.core.checkpoint import periodic_path, save_state
from baselines_tpu.core.math import explained_variance
from baselines_tpu.core.rng import seed_key
from baselines_tpu.core.schedules import resolve_fraction_schedule
from baselines_tpu.data.gae import gae
from baselines_tpu.ops.gather import take_rows_fast
from baselines_tpu.envs.vec import VecMonitor
from baselines_tpu.nn.policy import build_policy


@struct.dataclass
class PPOTrainState:
    params: Any
    opt_state: Any
    key: jax.Array
    env_state: Any
    obs: Any
    rnn_state: Any
    last_done: jnp.ndarray
    update_idx: jnp.ndarray  # int32


def _flat01(x):
    """(T, N, ...) -> (T*N, ...) — the sf01 flatten (ppo2/runner.py:69-74)."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def make_ppo_loss(policy, ent_coef, vf_coef, clip_value=True, remat=False):
    apply = jax.checkpoint(policy.apply) if remat else policy.apply

    def loss_fn(params, batch, advs, cliprange, rnn_init=None):
        """batch leaves are flat (B, ...) for feedforward; time-major
        (T, B, ...) plus rnn_init (B, h) for recurrent policies.  `advs` are
        pre-normalized at the MINIBATCH level (model.py:136-139) so gradient
        microbatching slices them without renormalizing
        (microbatched_model.py:35-75 contract)."""
        obs, actions, returns, old_values, old_neglogps, rnn_masks = batch
        if rnn_init is not None:

            def step(rnn, x):
                obs_t, mask_t = x
                pdflat_t, vf_t, rnn = policy.apply(params, obs_t, rnn, mask_t)
                return rnn, (pdflat_t, vf_t)

            _, (pdflat, vpred) = jax.lax.scan(step, rnn_init, (obs, rnn_masks))
            pdflat = _flat01(pdflat)
            vpred = _flat01(vpred)
            actions, returns, old_values, old_neglogps, advs = (
                _flat01(actions),
                _flat01(returns),
                _flat01(old_values),
                _flat01(old_neglogps),
                _flat01(advs),
            )
        else:
            pdflat, vpred, _ = apply(params, obs)
        pd = policy.pdtype.pdfromflat(pdflat)

        neglogpac = pd.neglogp(actions)
        entropy = jnp.mean(pd.entropy())

        vf_losses1 = jnp.square(vpred - returns)
        if clip_value:
            vpredclipped = old_values + jnp.clip(vpred - old_values, -cliprange, cliprange)
            vf_losses2 = jnp.square(vpredclipped - returns)
            vf_loss = 0.5 * jnp.mean(jnp.maximum(vf_losses1, vf_losses2))
        else:
            # ppo1 uses a plain value MSE (pposgd_simple.py loss list — no
            # value clipping existed in first-gen PPO)
            vf_loss = 0.5 * jnp.mean(vf_losses1)

        ratio = jnp.exp(old_neglogps - neglogpac)
        pg_losses = -advs * ratio
        pg_losses2 = -advs * jnp.clip(ratio, 1.0 - cliprange, 1.0 + cliprange)
        pg_loss = jnp.mean(jnp.maximum(pg_losses, pg_losses2))

        approxkl = 0.5 * jnp.mean(jnp.square(neglogpac - old_neglogps))
        clipfrac = jnp.mean((jnp.abs(ratio - 1.0) > cliprange).astype(jnp.float32))

        loss = pg_loss - entropy * ent_coef + vf_loss * vf_coef
        return loss, {
            "policy_loss": pg_loss,
            "value_loss": vf_loss,
            "policy_entropy": entropy,
            "approxkl": approxkl,
            "clipfrac": clipfrac,
        }

    return loss_fn


def _normalize_advs(returns, values):
    advs = returns - values
    return (advs - advs.mean()) / (advs.std() + 1e-8)


def make_update_fn(
    policy,
    venv,
    tx,
    *,
    nsteps,
    nminibatches,
    noptepochs,
    gamma,
    lam,
    ent_coef,
    vf_coef,
    lr_fn,
    cliprange_fn,
    nupdates,
    microbatch_size=None,
    pipelined=False,
    adv_norm="minibatch",
    clip_value=True,
    ndev=1,
    unroll=False,
    remat=False,
):
    """adv_norm: 'minibatch' standardizes advantages per minibatch
    (ppo2/model.py:136-139); 'batch' standardizes once over the whole actor
    batch before the epochs (ppo1/pposgd_simple.py semantics).  clip_value
    selects ppo2's clipped value loss vs ppo1's plain MSE.

    ndev: number of dp-mesh shards the env axis is split over.  When > 1 the
    epoch shuffle is SHARD-LOCAL — each device permutes only its own envs'
    samples and every minibatch takes an equal slice from every shard.  This
    is the reference's distributed semantics exactly (each MPI rank runs its
    own runner and shuffles its own batch, ppo2/ppo2.py:160-165, with only
    the gradient mean crossing ranks, mpi_adam_optimizer.py:39-46) and it is
    what keeps the train epochs data-parallel under GSPMD: a GLOBAL element
    permutation of a dp-sharded batch forces XLA to all-gather the whole
    trajectory onto every device, serializing the train phase."""
    nenvs = venv.num_envs
    assert adv_norm in ("minibatch", "batch"), adv_norm
    assert nenvs % ndev == 0, (nenvs, ndev)
    loss_fn = make_ppo_loss(policy, ent_coef, vf_coef, clip_value=clip_value, remat=remat)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    recurrent = policy.is_recurrent
    if pipelined:
        assert not recurrent, "pipelined rollouts support feedforward policies"
    if recurrent:
        assert nenvs % nminibatches == 0, (
            "recurrent PPO needs nminibatches to divide num_envs (ppo2/ppo2.py:107)"
        )
        assert microbatch_size is None, "microbatching + recurrence unsupported"

    def minibatch_grads(params, mb_batch, mb_advs, cliprange, mb_rnn):
        """Gradient of one minibatch, optionally accumulated over
        microbatches (MicrobatchedModel, ppo2/microbatched_model.py:35-75).
        mb_advs is None for per-minibatch normalization, or the slice of the
        batch-normalized advantages (adv_norm='batch')."""
        _, _, mb_returns, mb_values, _, _ = mb_batch
        advs = _normalize_advs(mb_returns, mb_values) if mb_advs is None else mb_advs
        if microbatch_size is None:
            (_, metrics), grads = grad_fn(params, mb_batch, advs, cliprange, mb_rnn)
            return grads, metrics
        nmicro = mb_returns.shape[0] // microbatch_size
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((nmicro, microbatch_size) + x.shape[1:]),
            (mb_batch, advs),
        )

        def micro_step(_, x):
            m_batch, m_advs = x
            (_, metrics), grads = grad_fn(params, m_batch, m_advs, cliprange, None)
            return None, (grads, metrics)

        _, (grads, metrics) = jax.lax.scan(micro_step, None, micro)
        mean = lambda t: jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0), t)
        return mean(grads), mean(metrics)

    def update_fn(state: PPOTrainState):
        frac = 1.0 - state.update_idx.astype(jnp.float32) / nupdates
        lr = lr_fn(frac)
        cliprange = cliprange_fn(frac)

        rollout_init_rnn = state.rnn_state
        if pipelined:
            from baselines_tpu.algos.common import run_rollout_pipelined

            key, env_state, traj, last_value = run_rollout_pipelined(
                policy, venv, state.params, state.key, state.env_state, nsteps
            )
            obs, rnn_state, last_done = state.obs, state.rnn_state, state.last_done
        else:
            key, env_state, obs, rnn_state, last_done, traj, last_value = run_rollout(
                policy,
                venv,
                state.params,
                state.key,
                state.env_state,
                state.obs,
                state.rnn_state,
                state.last_done,
                nsteps,
            )
        advs, returns = gae(traj.rewards, traj.values, traj.dones, last_value, gamma, lam)

        batch_t = (traj.obs, traj.actions, returns, traj.values, traj.neglogps, traj.rnn_masks)
        # adv_norm='batch': standardize once over the whole actor batch
        # (pposgd_simple atarg standardization) and slice alongside the batch
        batch_advs_t = _normalize_advs(returns, traj.values) if adv_norm == "batch" else None

        if recurrent:
            envs_per_mb = nenvs // nminibatches

            def mb_step(carry, mb):
                params, opt_state = carry
                mb_batch, mb_advs, mb_rnn = mb
                grads, metrics = minibatch_grads(params, mb_batch, mb_advs, cliprange, mb_rnn)
                params, opt_state = apply_updates_lr(tx, params, opt_state, grads, lr)
                return (params, opt_state), metrics

            if ndev == 1:

                def epoch_step(carry, ekey):
                    perm = jax.random.permutation(ekey, nenvs).reshape(nminibatches, envs_per_mb)

                    def mb_of(eidx):
                        mb_batch = jax.tree_util.tree_map(lambda x: x[:, eidx], batch_t)
                        mb_advs = None if batch_advs_t is None else batch_advs_t[:, eidx]
                        return mb_batch, mb_advs, rollout_init_rnn[eidx]

                    mbs = jax.vmap(mb_of)(perm)  # leading axis nminibatches
                    return jax.lax.scan(mb_step, carry, mbs)

            else:
                # shard-local env shuffle: each dp shard permutes its own
                # envs; every minibatch takes envs_per_mb/ndev envs per shard
                nl_envs = nenvs // ndev
                epb_l = envs_per_mb // ndev
                assert envs_per_mb % ndev == 0, (envs_per_mb, ndev)

                def to_shards(x):  # (T, N, ...) -> (ndev, T, N/ndev, ...)
                    x = x.reshape((nsteps, ndev, nl_envs) + x.shape[2:])
                    return jnp.moveaxis(x, 1, 0)

                batch_sh = jax.tree_util.tree_map(to_shards, batch_t)
                advs_sh = None if batch_advs_t is None else to_shards(batch_advs_t)
                rnn_sh = jax.tree_util.tree_map(
                    lambda x: x.reshape((ndev, nl_envs) + x.shape[1:]), rollout_init_rnn
                )

                def epoch_step(carry, ekey):
                    perms = jax.vmap(lambda k: jax.random.permutation(k, nl_envs))(
                        jax.random.split(ekey, ndev)
                    ).reshape(ndev, nminibatches, epb_l)

                    def mb_of(midx):
                        eidx = perms[:, midx]  # (ndev, epb_l)
                        # per-shard env gather, then fold shards back into the
                        # minibatch's batch axis (shard-major, so the merged
                        # axis stays dp-sharded under GSPMD)
                        def take(x):  # (ndev, T, N/ndev, ...) -> (T, ndev*epb_l, ...)
                            g = jax.vmap(lambda xd, ed: xd[:, ed])(x, eidx)
                            g = jnp.moveaxis(g, 0, 1)  # (T, ndev, epb_l, ...)
                            return g.reshape((nsteps, ndev * epb_l) + g.shape[3:])

                        mb_batch = jax.tree_util.tree_map(take, batch_sh)
                        mb_advs = None if advs_sh is None else take(advs_sh)
                        mb_rnn = jax.tree_util.tree_map(
                            lambda x: jax.vmap(lambda xd, ed: xd[ed])(x, eidx).reshape(
                                (ndev * epb_l,) + x.shape[2:]
                            ),
                            rnn_sh,
                        )
                        return mb_batch, mb_advs, mb_rnn

                    mbs = jax.vmap(mb_of)(jnp.arange(nminibatches))
                    return jax.lax.scan(mb_step, carry, mbs)

        else:
            nbatch = nenvs * nsteps
            nbatch_train = nbatch // nminibatches

            def mb_step(carry, mb):
                params, opt_state = carry
                mb_batch, mb_advs = mb
                grads, metrics = minibatch_grads(params, mb_batch, mb_advs, cliprange, None)
                params, opt_state = apply_updates_lr(tx, params, opt_state, grads, lr)
                return (params, opt_state), metrics

            if ndev == 1:
                batch_flat = jax.tree_util.tree_map(_flat01, batch_t)
                batch_advs = None if batch_advs_t is None else _flat01(batch_advs_t)

                def epoch_step(carry, ekey):
                    perm = jax.random.permutation(ekey, nbatch)
                    slice_mb = lambda x: take_rows_fast(x, perm).reshape(
                        (nminibatches, nbatch_train) + x.shape[1:]
                    )
                    mbs = jax.tree_util.tree_map(slice_mb, batch_flat)
                    advs_mbs = None if batch_advs is None else slice_mb(batch_advs)
                    return jax.lax.scan(mb_step, carry, (mbs, advs_mbs), unroll=unroll)

            else:
                # shard-local shuffle (the per-MPI-rank shuffle of
                # ppo2/ppo2.py:160-165): permute each shard's samples among
                # themselves so no cross-device element gather exists and the
                # epochs stay fully data-parallel.  Layout: (T, N, ...) ->
                # (ndev, local_nbatch, ...) with axis 0 dp-sharded; minibatch
                # = an equal slice of every shard, merged shard-major so the
                # flat batch axis stays dp-sharded.
                nl_envs = nenvs // ndev
                local_nbatch = nl_envs * nsteps
                local_mb = nbatch_train // ndev
                assert nbatch_train % ndev == 0, (nbatch_train, ndev)

                def to_local(x):  # (T, N, ...) -> (ndev, local_nbatch, ...)
                    x = x.reshape((nsteps, ndev, nl_envs) + x.shape[2:])
                    x = jnp.moveaxis(x, 1, 0)
                    return x.reshape((ndev, local_nbatch) + x.shape[3:])

                batch_local = jax.tree_util.tree_map(to_local, batch_t)
                advs_local = None if batch_advs_t is None else to_local(batch_advs_t)
                merge = lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

                def mb_step_sharded(carry, mb):
                    mb_batch, mb_advs = mb  # leaves (ndev, local_mb, ...)
                    mb_batch = jax.tree_util.tree_map(merge, mb_batch)
                    mb_advs = None if mb_advs is None else merge(mb_advs)
                    return mb_step(carry, (mb_batch, mb_advs))

                def epoch_step(carry, ekey):
                    perms = jax.vmap(lambda k: jax.random.permutation(k, local_nbatch))(
                        jax.random.split(ekey, ndev)
                    )

                    def slice_mb(x):  # (ndev, local_nbatch, ...)
                        g = jax.vmap(take_rows_fast)(x, perms)
                        g = g.reshape((ndev, nminibatches, local_mb) + x.shape[2:])
                        return jnp.moveaxis(g, 1, 0)  # (nmb, ndev, local_mb, ...)

                    mbs = jax.tree_util.tree_map(slice_mb, batch_local)
                    advs_mbs = None if advs_local is None else slice_mb(advs_local)
                    return jax.lax.scan(mb_step_sharded, carry, (mbs, advs_mbs))

        key, ekeys = key, jax.random.split(key, noptepochs + 1)
        key, ekeys = ekeys[0], ekeys[1:]
        (params, opt_state), metrics = jax.lax.scan(
            epoch_step, (state.params, state.opt_state), ekeys, unroll=unroll
        )
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        metrics["explained_variance"] = explained_variance(_flat01(traj.values), _flat01(returns))
        metrics["learning_rate"] = lr
        metrics["cliprange"] = cliprange

        new_state = PPOTrainState(
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

    return update_fn


def learn(
    *,
    env=None,
    env_id: str | None = None,
    network: str = "mlp",
    total_timesteps: int,
    seed: int | None = None,
    num_envs: int = 8,
    env_kwargs: dict | None = None,
    nsteps: int = 2048,
    ent_coef: float = 0.0,
    lr=3e-4,
    vf_coef: float = 0.5,
    max_grad_norm: float = 0.5,
    gamma: float = 0.99,
    lam: float = 0.95,
    log_interval: int = 10,
    nminibatches: int = 4,
    noptepochs: int = 4,
    cliprange=0.2,
    save_interval: int = 0,
    load_path: str | None = None,
    value_network: str | None = None,
    microbatch_size: int | None = None,
    pipeline: bool | None = None,
    mesh=None,
    adv_norm: str = "minibatch",
    clip_value: bool = True,
    adam_epsilon: float = 1e-5,
    **network_kwargs,
) -> Model:
    """Uniform learn contract (ppo2/ppo2.py:21-218 signature analog).

    pipeline: overlap host env stepping with device compute via the
    antiphase env-group pair (envs/host_pipeline.py).  None (default)
    auto-enables for host/native-backed envs with an even num_envs >= 2 and
    a feedforward network; pure-JAX envs always use the fused on-device
    rollout (no host to overlap with)."""
    from baselines_tpu.envs.registry import is_jax_env

    if pipeline is None:
        # non-string networks (callables / modules) can't be sniffed for
        # recurrence here; fall back to the fused rollout for them
        pipeline = (
            env is None
            and env_id is not None
            and not is_jax_env(env_id)
            and num_envs >= 2
            and num_envs % 2 == 0
            and mesh is None
            and isinstance(network, str)
            and "lstm" not in network
        )
    if pipeline:
        from baselines_tpu.algos.common import build_env_pair, init_pipe_state

        assert env is None, "pipeline mode builds its own env pair from env_id"
        venv = build_env_pair(env_id, num_envs, **(env_kwargs or {}))
    else:
        venv = env if env is not None else build_env(env_id, num_envs, **(env_kwargs or {}))
    nenvs = venv.num_envs
    nbatch = nenvs * nsteps
    nupdates = max(total_timesteps // nbatch, 1) if total_timesteps > 0 else 0

    policy = build_policy(
        venv.observation_space,
        venv.action_space,
        network,
        value_network=value_network,
        **network_kwargs,
    )

    tx = adam_optimizer(max_grad_norm, eps=adam_epsilon)
    from baselines_tpu.algos.common import dealias, jit_init

    if pipeline:
        key = seed_key(seed)
        key, kreset, kinit = jax.random.split(key, 3)
        kra, krb, kprime = jax.random.split(kreset, 3)
        reset_a = venv.a.reset(kra)
        reset_b = venv.b.reset(krb)
        obs = reset_a[0]
        params = policy.init(kinit, obs)
        env_state = init_pipe_state(policy, venv, params, kprime, reset_a, reset_b)
        state = dealias(
            PPOTrainState(
                params=params,
                opt_state=tx.init(params),
                key=key,
                env_state=env_state,
                obs=obs,
                rnn_state=policy.initial_state(nenvs),
                last_done=jnp.zeros((nenvs,), bool),
                update_idx=jnp.zeros((), jnp.int32),
            )
        )
    else:

        def make_state(key):
            key, kreset, kinit = jax.random.split(key, 3)
            obs, env_state = venv.reset(kreset)
            params = policy.init(kinit, obs)
            return PPOTrainState(
                params=params,
                opt_state=tx.init(params),
                key=key,
                env_state=env_state,
                obs=obs,
                rnn_state=policy.initial_state(nenvs),
                last_done=jnp.zeros((nenvs,), bool),
                update_idx=jnp.zeros((), jnp.int32),
            )

        state = jit_init(make_state, seed_key(seed))

    if mesh is not None:
        from baselines_tpu.distributed.mesh import shard_train_state

        state = shard_train_state(mesh, state, nenvs)

    update_fn = jax.jit(
        make_update_fn(
            policy,
            venv,
            tx,
            nsteps=nsteps,
            nminibatches=nminibatches,
            noptepochs=noptepochs,
            gamma=gamma,
            lam=lam,
            ent_coef=ent_coef,
            vf_coef=vf_coef,
            lr_fn=resolve_fraction_schedule(lr),
            cliprange_fn=resolve_fraction_schedule(cliprange),
            nupdates=nupdates,
            microbatch_size=microbatch_size,
            pipelined=pipeline,
            adv_norm=adv_norm,
            clip_value=clip_value,
            ndev=mesh.devices.size if mesh is not None else 1,
        ),
        donate_argnums=0,
    )

    model = Model(policy, state)
    if load_path is not None:
        model.load(load_path)
        state = model.state

    # auto-resume for long runs (VERDICT r2 #8): save_interval checkpoints
    # hold the FULL train state including update_idx, so a killed run
    # restarts from its latest checkpoint with schedule progress intact —
    # the ppo2 analog of deepq's auto-resume (deepq/deepq.py:244-257;
    # ppo2 itself only saves, ppo2/ppo2.py:211-216).  An explicit load_path
    # wins over auto-resume: a user pointing at a specific checkpoint must
    # not be silently overridden by stale checkpoints/ from a prior run in
    # the same log dir.  Caveat for host/pipelined envs: the checkpoint
    # restores device-side env state (obs, pending pipe transitions,
    # normalize/monitor stats) but host env pools restart fresh, so the
    # FIRST post-resume rollout pairs checkpointed obs with freshly-reset
    # host envs — one rollout of slightly inconsistent transitions, same
    # order as the update-boundary staleness documented in
    # envs/host_pipeline.py (pure-JAX envs resume bitwise; tests/test_resume.py)
    start_update = 0
    if save_interval and logger.get_dir() and load_path is None:
        from baselines_tpu.core.checkpoint import latest_checkpoint, load_state

        latest = latest_checkpoint(logger.get_dir())
        if latest is not None:
            state = load_state(latest, jax.device_get(state))
            state = jax.device_put(state)
            if mesh is not None:
                from baselines_tpu.distributed.mesh import shard_train_state

                state = shard_train_state(mesh, state, nenvs)
            start_update = int(state.update_idx)
            logger.log(f"Resuming from checkpoint {latest} (update {start_update})")

    tfirststart = time.time()
    tlastlog, lastlog_update = tfirststart, start_update
    for update in range(start_update + 1, nupdates + 1):
        state, metrics = update_fn(state)
        if update % log_interval == 0 or update == 1:
            metrics = jax.device_get(metrics)
            tnow = time.time()
            # fps over the whole interval since the last sync: dispatch is
            # async, so per-update wall time is meaningless — the syncing
            # update absorbs every queued update's device time
            fps = int((update - lastlog_update) * nbatch / (tnow - tlastlog))
            tlastlog, lastlog_update = tnow, update
            stats = VecMonitor.get_stats(state.env_state)
            logger.logkv("misc/serial_timesteps", update * nsteps)
            logger.logkv("misc/nupdates", update)
            logger.logkv("misc/total_timesteps", update * nbatch)
            logger.logkv("fps", fps)
            logger.logkv("eprewmean", float(stats.mean_return))
            logger.logkv("eplenmean", float(stats.mean_length))
            logger.logkv("misc/time_elapsed", tnow - tfirststart)
            for k, v in metrics.items():
                logger.logkv(f"loss/{k}" if "loss" in k or k in ("approxkl", "clipfrac", "policy_entropy") else k, float(v))
            logger.dumpkvs()
        if save_interval and (update % save_interval == 0 or update == 1) and logger.get_dir():
            save_state(periodic_path(logger.get_dir(), update), jax.device_get(state))
    model.state = state
    return model
