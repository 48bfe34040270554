"""TRPO — natural-gradient trust region, parity with baselines/trpo_mpi.

Update parity (trpo_mpi/trpo_mpi.py:89-392): surrogate = E[ratio·A] with
globally-standardized advantages (:303), entropy bonus (:192), Fisher-vector
products as Hessian-of-KL-vector products on a 1-in-5 subsample of the batch
(:307-311 fvpargs) with cg_damping, conjugate gradient (common/cg.py:2-34),
step scaling by sqrt(2·max_kl/ sᵀHs), backtracking line search accepting
positive improvement under kl ≤ 1.5·max_kl (:330-350), and a separate
'copy' value tower fit by Adam for vf_iters epochs of 64-minibatches
(:358-364, value_network='copy' at :168).

TPU-native structure: the reference's CG loop does a sess.run + host MPI
allreduce PER CG ITERATION and per line-search probe (~25 network
round-trips per policy iteration, SURVEY §3.4).  Here the WHOLE iteration —
rollout, GAE, gradient, 10 CG iterations (lax.while_loop of HVPs via
jax.jvp), 10 line-search probes evaluated as one batched scan, and the vf
epochs — is a single jitted computation; under a dp mesh every batch mean
compiles to one fused ICI all-reduce, and the line-search decision is
computed from globally-reduced losses so all replicas take identical
branches (deadlock-free by construction).
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from baselines_tpu.algos.common import Model, build_env, dealias, run_rollout
from baselines_tpu.core import logger
from baselines_tpu.core.math import explained_variance, flatten_tree, unflatten_like
from baselines_tpu.core.rng import seed_key
from baselines_tpu.data.gae import gae
from baselines_tpu.envs.vec import VecMonitor
from baselines_tpu.nn.policy import build_policy

POLICY_KEYS = ("network", "pi", "logstd")  # vs value tower: value_network, vf


def split_params(params):
    pol = {k: v for k, v in params["params"].items() if k in POLICY_KEYS}
    vf = {k: v for k, v in params["params"].items() if k not in POLICY_KEYS}
    return {"params": pol}, {"params": vf}


def merge_params(pol, vf):
    return {"params": {**pol["params"], **vf["params"]}}


@struct.dataclass
class TRPOTrainState:
    params: Any
    vf_opt: Any
    key: jax.Array
    env_state: Any
    obs: Any
    rnn_state: Any
    last_done: jnp.ndarray
    iters: jnp.ndarray


def _flat01(x):
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


from baselines_tpu.core.cg import cg


def cg_solve(hvp, b, cg_iters: int, residual_tol: float = 1e-10):
    """Conjugate gradient (common/cg.py:2-34; implementation in core/cg.py)."""
    return cg(hvp, b, cg_iters, residual_tol)


def learn(
    *,
    env=None,
    env_id: str | None = None,
    network: str = "mlp",
    total_timesteps: int,
    seed: int | None = None,
    num_envs: int = 1,
    env_kwargs: dict | None = None,
    timesteps_per_batch: int = 1024,
    max_kl: float = 0.001,
    cg_iters: int = 10,
    gamma: float = 0.99,
    lam: float = 1.0,
    ent_coef: float = 0.0,
    cg_damping: float = 1e-2,
    vf_stepsize: float = 3e-4,
    vf_iters: int = 3,
    fvp_subsample: int = 5,
    log_interval: int = 1,
    save_interval: int = 0,
    load_path: str | None = None,
    normalize_observations: bool = False,
    mesh=None,
    **network_kwargs,
) -> Model:
    """trpo_mpi.learn analog (trpo_mpi.py:89-145 signature/defaults).

    normalize_observations (trpo_mpi defaults.py mujoco): the reference
    normalizes inside the policy via an in-graph RunningMeanStd
    (policies.py:182-185); here observation normalization is the env's job
    (VecNormalize, stats checkpointed with the model), so this flag just
    guarantees the env chain is normalized."""
    if env is None and normalize_observations:
        env_kwargs = dict(env_kwargs or {})
        env_kwargs.setdefault("normalize", True)
    venv = env if env is not None else build_env(env_id, num_envs, **(env_kwargs or {}))
    nenvs = venv.num_envs
    nsteps = max(timesteps_per_batch // nenvs, 1)
    nbatch = nsteps * nenvs
    niters = max(total_timesteps // nbatch, 1) if total_timesteps > 0 else 0

    policy = build_policy(
        venv.observation_space, venv.action_space, network,
        value_network="copy", **network_kwargs,
    )
    assert not policy.is_recurrent, (
        "recurrent policies unsupported for trpo (reference issue #188)"
    )

    vf_tx = optax.adam(vf_stepsize, eps=1e-8)

    def pd_of(pol_params, vf_params, o):
        pdflat, vf, _ = policy.apply(merge_params(pol_params, vf_params), o)
        return policy.pdtype.pdfromflat(pdflat), vf

    def update_fn(state: TRPOTrainState):
        key, env_state, obs, rnn_state, last_done, traj, last_value = run_rollout(
            policy, venv, state.params, state.key, state.env_state, state.obs,
            state.rnn_state, state.last_done, nsteps,
        )
        advs, tdlamret = gae(traj.rewards, traj.values, traj.dones, last_value, gamma, lam)
        ob = _flat01(traj.obs)
        ac = _flat01(traj.actions)
        atarg = _flat01(advs)
        ret = _flat01(tdlamret)
        old_neglogp = _flat01(traj.neglogps)
        atarg = (atarg - atarg.mean()) / (atarg.std() + 1e-8)  # trpo_mpi.py:303

        pol_params, vf_params = split_params(state.params)
        old_pdflat, _, _ = policy.apply(state.params, ob)
        old_pdflat = jax.lax.stop_gradient(old_pdflat)
        old_pd_template = policy.pdtype.pdfromflat(old_pdflat)

        def losses_fn(pp):
            pd, _ = pd_of(pp, vf_params, ob)
            neglogp = pd.neglogp(ac)
            ratio = jnp.exp(old_neglogp - neglogp)
            surrgain = jnp.mean(ratio * atarg)
            meankl = jnp.mean(policy.pdtype.pdfromflat(old_pdflat).kl(pd))
            meanent = jnp.mean(pd.entropy())
            optimgain = surrgain + ent_coef * meanent
            return optimgain, (surrgain, meankl, meanent)

        (gain0, (surr0, kl0, ent0)), g_tree = jax.value_and_grad(
            losses_fn, has_aux=True
        )(pol_params)
        g = flatten_tree(g_tree)

        # Fisher-vector product on a subsample (trpo_mpi.py:307-311)
        ob_s = ob[::fvp_subsample]
        old_s = old_pdflat[::fvp_subsample]

        def mean_kl_sub(pp):
            pd, _ = pd_of(pp, vf_params, ob_s)
            return jnp.mean(policy.pdtype.pdfromflat(old_s).kl(pd))

        kl_grad_fn = jax.grad(mean_kl_sub)

        def hvp(v_flat):
            v_tree = unflatten_like(v_flat, pol_params)
            _, hv = jax.jvp(kl_grad_fn, (pol_params,), (v_tree,))
            return flatten_tree(hv) + cg_damping * v_flat

        stepdir = cg_solve(hvp, g, cg_iters)
        shs = 0.5 * jnp.dot(stepdir, hvp(stepdir))
        lm = jnp.sqrt(jnp.maximum(shs / max_kl, 1e-12))
        fullstep = stepdir / lm
        expectedimprove = jnp.dot(g, fullstep)
        th_before = flatten_tree(pol_params)

        # backtracking line search as a fixed-trip scan (trpo_mpi.py:330-350);
        # every replica computes the same globally-reduced losses, so the
        # accept decision is identical everywhere.
        def probe(k):
            stepsize = 0.5**k
            th_new = th_before + fullstep * stepsize
            gain, (surr, kl, _) = losses_fn(unflatten_like(th_new, pol_params))
            improve = gain - gain0
            ok = (
                jnp.isfinite(gain)
                & (improve > 0)
                & (kl <= max_kl * 1.5)
            )
            return ok, th_new, improve, kl

        ks = jnp.arange(10, dtype=jnp.float32)
        oks, th_news, improves, kls = jax.vmap(probe)(ks)
        any_ok = jnp.any(oks)
        first = jnp.argmax(oks)  # first True
        th_final = jnp.where(any_ok, th_news[first], th_before)
        pol_params = unflatten_like(th_final, pol_params)

        # value function fit: vf_iters epochs of minibatch-64 Adam
        # (trpo_mpi.py:358-364)
        mbsize = 64
        nmb = max(nbatch // mbsize, 1)

        def vf_loss_fn(vfp, o, r):
            _, vpred = pd_of(pol_params, vfp, o)
            return jnp.mean(jnp.square(vpred - r))

        def vf_epoch(carry, ekey):
            vfp, opt = carry
            perm = jax.random.permutation(ekey, nbatch)
            ob_sh = ob[perm][: nmb * mbsize].reshape(nmb, mbsize, *ob.shape[1:])
            ret_sh = ret[perm][: nmb * mbsize].reshape(nmb, mbsize)

            def mb(carry, x):
                vfp, opt = carry
                o, r = x
                grads = jax.grad(vf_loss_fn)(vfp, o, r)
                updates, opt = vf_tx.update(grads, opt, vfp)
                vfp = optax.apply_updates(vfp, updates)
                return (vfp, opt), None

            return jax.lax.scan(mb, (vfp, opt), (ob_sh, ret_sh))

        key, *ekeys = jax.random.split(key, vf_iters + 1)
        (vf_params, vf_opt), _ = jax.lax.scan(
            vf_epoch, (vf_params, state.vf_opt), jnp.stack(ekeys)
        )

        new_params = merge_params(pol_params, vf_params)
        metrics = {
            "optimgain": gain0,
            "meankl": kls[first],
            "entropy": ent0,
            "surrgain": surr0,
            "expectedimprove": expectedimprove,
            "improve": jnp.where(any_ok, improves[first], 0.0),
            "linesearch_success": any_ok.astype(jnp.float32),
            "ev_tdlam_before": explained_variance(_flat01(traj.values), ret),
        }
        new_state = TRPOTrainState(
            params=new_params,
            vf_opt=vf_opt,
            key=key,
            env_state=env_state,
            obs=obs,
            rnn_state=rnn_state,
            last_done=last_done,
            iters=state.iters + 1,
        )
        return new_state, metrics

    def make_state(key):
        key, kreset, kinit = jax.random.split(key, 3)
        obs, env_state = venv.reset(kreset)
        params = policy.init(kinit, obs)
        _, vf0 = split_params(params)
        return TRPOTrainState(
            params=params,
            vf_opt=vf_tx.init(vf0),
            key=key,
            env_state=env_state,
            obs=obs,
            rnn_state=None,
            last_done=jnp.zeros((nenvs,), bool),
            iters=jnp.zeros((), jnp.int32),
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

    # periodic full-state checkpoints + auto-resume with progress (the
    # ppo2-style save plus deepq-style resume, deepq/deepq.py:244-257 —
    # the reference's trpo_mpi has neither).  An explicit load_path wins
    # over auto-resume (see ppo.py: stale checkpoints/ in a reused log dir
    # must not override the user's checkpoint choice)
    start_it = 0
    if save_interval and logger.get_dir() and load_path is None:
        from baselines_tpu.core.checkpoint import (
            latest_checkpoint,
            load_state,
            periodic_path,
            save_state,
        )

        latest = latest_checkpoint(logger.get_dir())
        if latest is not None:
            state = load_state(latest, jax.device_get(state))
            state = jax.device_put(state)
            if mesh is not None:
                from baselines_tpu.distributed.mesh import shard_train_state

                state = shard_train_state(mesh, state, nenvs)
            start_it = int(state.iters)
            logger.log(f"Resuming from checkpoint {latest} (iter {start_it})")

    tstart = time.time()
    for it in range(start_it + 1, niters + 1):
        state, metrics = update(state)
        if save_interval and (it % save_interval == 0 or it == 1) and logger.get_dir():
            save_state(periodic_path(logger.get_dir(), it), jax.device_get(state))
        if log_interval and (it % log_interval == 0 or it == 1):
            metrics = jax.device_get(metrics)
            stats = VecMonitor.get_stats(state.env_state)
            logger.logkv("iters", it)
            logger.logkv("timesteps", it * nbatch)
            logger.logkv("EpRewMean", float(stats.mean_return))
            logger.logkv("EpLenMean", float(stats.mean_length))
            logger.logkv("fps", int(it * nbatch / (time.time() - tstart)))
            for k, v in metrics.items():
                logger.logkv(k, float(v))
            logger.dumpkvs()
    model.state = state
    return model
