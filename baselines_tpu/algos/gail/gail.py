"""GAIL — TRPO generator driven by a learned adversary reward, parity with
baselines/gail/trpo_mpi.py (TRPO loop interleaving `g_step` policy updates
with `d_step` discriminator updates per iteration; rewards come from the
TransitionClassifier, not the env) plus optional BC pretraining
(gail/behavior_clone.py, --pretrained flag of gail/run_mujoco.py).

Structure: one jitted update = rollout (recording env rewards only for
logging) → adversary reward relabel → GAE → TRPO natural-gradient step
(reusing algos/trpo machinery) → d_step discriminator Adam updates against
the expert dataset.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from baselines_tpu.algos.common import Model, build_env, dealias, run_rollout
from baselines_tpu.algos.gail.adversary import (
    Discriminator,
    adversary_loss,
    adversary_reward,
)
from baselines_tpu.algos.gail.behavior_clone import pretrain_bc
from baselines_tpu.algos.trpo.trpo import cg_solve, merge_params, split_params
from baselines_tpu.core import logger
from baselines_tpu.core.math import flatten_tree, unflatten_like
from baselines_tpu.core.rng import seed_key
from baselines_tpu.core.running_stats import RunningMeanStd
from baselines_tpu.data.gae import gae
from baselines_tpu.envs.vec import VecMonitor
from baselines_tpu.nn.policy import build_policy


@struct.dataclass
class GAILTrainState:
    params: Any
    vf_opt: Any
    d_params: Any
    d_opt: Any
    d_obs_rms: RunningMeanStd
    key: jax.Array
    env_state: Any
    obs: Any
    last_done: jnp.ndarray
    iters: jnp.ndarray


def _flat01(x):
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


class _ObsNormPolicy:
    """The reference GAIL policy's observation filter
    (gail/mlp_policy.py:34-42: obz = clip((ob - rms.mean)/rms.std, ±5)
    before the net, rms updated with each rollout's raw observations).

    Round-5 finding: WITHOUT this filter, from-scratch GAIL on HalfCheetah
    gets stuck in a backward-running equilibrium (EpTrueRew ~ -700..-1300,
    healthy disc accs 0.8-0.9, line-search KL ~0.005 — the raw-obs tanh
    policy is too badly conditioned for TRPO steps to reorganize the gait;
    3 seeds, results/gail_weak/).  The filter lives INSIDE the policy (not
    a VecNormalize wrapper) so the discriminator keeps seeing true raw
    observations with no reconstruction drift.

    Params are {"pi": <inner flax tree>, "ob_rms": RunningMeanStd} so the
    whole thing checkpoints through the standard Model.save payload."""

    def __init__(self, inner):
        self._inner = inner
        self.pdtype = inner.pdtype
        self.is_recurrent = inner.is_recurrent
        self.ob_space = inner.ob_space
        self.ac_space = inner.ac_space

    def initial_state(self, batch_size):
        return self._inner.initial_state(batch_size)

    def init(self, key, sample_obs):
        return {
            "pi": self._inner.init(key, sample_obs),
            "ob_rms": RunningMeanStd.create(sample_obs.shape[1:]),
        }

    def _norm(self, params, obs):
        rms = jax.lax.stop_gradient(params["ob_rms"])
        return jnp.clip(
            (obs - rms.mean) / jnp.sqrt(rms.var + 1e-8), -5.0, 5.0
        )

    def apply(self, params, obs, rnn_state=None, rnn_mask=None):
        return self._inner.apply(
            params["pi"], self._norm(params, obs), rnn_state, rnn_mask
        )

    def pd(self, params, obs, rnn_state=None, rnn_mask=None):
        pdflat, vf, rnn_state = self.apply(params, obs, rnn_state, rnn_mask)
        return self.pdtype.pdfromflat(pdflat), vf, rnn_state

    def step(self, params, key, obs, rnn_state=None, rnn_mask=None):
        pd, vf, rnn_state = self.pd(params, obs, rnn_state, rnn_mask)
        action = pd.sample(key)
        return action, vf, pd.neglogp(action), rnn_state

    def mode_step(self, params, obs, rnn_state=None, rnn_mask=None):
        pd, vf, rnn_state = self.pd(params, obs, rnn_state, rnn_mask)
        return pd.mode(), vf, rnn_state

    def value(self, params, obs, rnn_state=None, rnn_mask=None):
        _, vf, _ = self.apply(params, obs, rnn_state, rnn_mask)
        return vf


class _GAILModel(Model):
    """Model whose load() accepts round-4 GAIL checkpoints (bare policy
    tree, no obfilter): a legacy payload swaps the policy back to the
    unfiltered inner PolicyWithValue so committed round-4 artifacts
    evaluate bit-identically.  Legacy checkpoints are eval-compatible
    only — continuing training requires a current-format checkpoint.

    save() additionally bundles the ADVERSARY (d_params, d_opt,
    d_obs_rms) and the value-tower Adam state, so a --load_path
    continuation resumes the discriminator instead of re-initializing
    it.  Measured motivation: resuming a 3M-step from-scratch run with a
    params-only checkpoint knocked the generator from +6 to −695 while a
    fresh discriminator re-converged (results/gail_ref_calib/RESULTS.md
    §3).  The reference's saver has the same property for free — its
    checkpoint covers every graph variable including the adversary
    (gail/trpo_mpi.py task_name saver over the full graph)."""

    _ADVERSARY_FIELDS = ("d_params", "d_opt", "d_obs_rms", "vf_opt")

    def save(self, path):
        from baselines_tpu.core import checkpoint as ckpt

        payload = {
            "model_params": self.params,
            "gail_adversary": {
                f: getattr(self.state, f) for f in self._ADVERSARY_FIELDS
            },
        }
        ckpt.save_state(path, payload)

    def load(self, path):
        from flax import serialization

        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        mp = (
            raw["model_params"]
            if isinstance(raw, dict) and "model_params" in raw
            else raw
        )
        legacy = (
            isinstance(self.policy, _ObsNormPolicy)
            and isinstance(mp, dict)
            and "pi" not in mp
        )
        if legacy:
            inner = self.policy._inner
            tmpl = jax.device_get(self.params["pi"])
            # round-4 mlp checkpoints predate the hid=100 default
            # (run_mujoco.py:78 parity added in round 5): rebuild the inner
            # policy at the checkpoint's own hidden width
            try:
                nh = int(mp["params"]["network"]["mlp_fc0"]["kernel"].shape[1])
            except (KeyError, AttributeError, TypeError, IndexError):
                nh = None
            builder = self.extra.get("legacy_policy_builder")
            if nh is not None and builder is not None:
                inner = builder(nh)
                obs0 = jnp.zeros(
                    (1,) + tuple(self.policy.ob_space.shape), jnp.float32
                )
                tmpl = jax.device_get(inner.init(jax.random.PRNGKey(0), obs0))
            params = serialization.from_state_dict(tmpl, mp)
            self.policy = inner
            self.state = self.state.replace(params=jax.device_put(params))
            return self
        super().load(path)
        if isinstance(raw, dict) and "gail_adversary" in raw:
            tmpl = jax.device_get(
                {f: getattr(self.state, f) for f in self._ADVERSARY_FIELDS}
            )
            adv = serialization.from_state_dict(tmpl, raw["gail_adversary"])
            self.state = self.state.replace(**jax.device_put(adv))
        return self


def learn(
    *,
    env=None,
    env_id: str | None = None,
    network: str = "mlp",
    total_timesteps: int,
    expert_dataset=None,
    expert_path: str | None = None,
    traj_limitation: int = -1,
    seed: int | None = None,
    num_envs: int = 4,
    env_kwargs: dict | None = None,
    timesteps_per_batch: int = 1024,
    max_kl: float = 0.01,
    cg_iters: int = 10,
    gamma: float = 0.995,
    lam: float = 0.97,
    ent_coef: float = 0.0,
    cg_damping: float = 0.1,
    vf_stepsize: float = 1e-3,
    vf_iters: int = 5,
    d_stepsize: float = 3e-4,
    g_step: int = 3,
    d_step: int = 1,
    adversary_hidden_size: int = 100,
    adversary_entcoeff: float = 1e-3,
    pretrained: bool = False,
    bc_max_iters: int = 1000,
    policy_obfilter: bool = True,
    fvp_subsample: int = 5,
    log_interval: int = 1,
    load_path: str | None = None,
    mesh=None,
    **network_kwargs,
) -> Model:
    """gail/trpo_mpi.learn analog.

    expert_path: .npz of expert trajectories in the reference schema
    (gail/dataset/mujoco_dset.py: obs (E,T,do), acs (E,T,da)) — the CLI
    route (`--alg=gail --expert_path=...`); expert_dataset takes precedence
    when both are given."""
    if expert_dataset is None and expert_path is not None:
        from baselines_tpu.algos.gail.dataset import ExpertDataset

        expert_dataset = ExpertDataset(
            expert_path=expert_path, traj_limitation=traj_limitation
        )
    assert expert_dataset is not None, "GAIL requires an expert_dataset (or expert_path)"
    # RAW observations by default, reference parity: gail/run_mujoco.py
    # trains on plain gym envs (no VecNormalize); the discriminator gets raw
    # obs (trpo_mpi.py:317-326) and normalizes them with its own obs_rms
    # (adversary.py).  Measured failure mode of a VecNormalize'd env: the
    # de-normalized reconstruction of generator obs carries stat-drift
    # artifacts in early iterations, the discriminator separates on those
    # (acc ~0.99 within 30 iters) and the race never recovers (EpTrueRew
    # -1600 at 3M steps), while the raw config keeps accs at a healthy
    # 0.6-0.8.  BC on raw obs reaches 97% of the expert score, so the
    # policy does not need obs normalization here.  Passing a normalized
    # env explicitly still works — update_fn then reconstructs raw obs for
    # the discriminator from the env's running statistics.
    env_kwargs = dict(env_kwargs or {})
    env_kwargs.setdefault("normalize", False)
    venv = env if env is not None else build_env(env_id, num_envs, **env_kwargs)
    # locate a VecNormalize in the wrapper chain (if the caller passed a
    # normalized env) so the raw-obs reconstruction uses ITS epsilon/clipob
    from baselines_tpu.envs.vec import VecNormalize as _VecNormalize

    norm_wrapper, _w = None, venv
    while _w is not None:
        if isinstance(_w, _VecNormalize):
            norm_wrapper = _w
            break
        _w = getattr(_w, "venv", None)
    nenvs = venv.num_envs
    nsteps = max(timesteps_per_batch // nenvs, 1)
    nbatch = nsteps * nenvs
    niters = max(total_timesteps // nbatch, 1) if total_timesteps > 0 else 0

    if network == "mlp":
        # gail/run_mujoco.py:78: policy_hidden_size=100, 2 layers
        network_kwargs.setdefault("num_hidden", 100)
    inner_policy = build_policy(
        venv.observation_space, venv.action_space, network,
        value_network="copy", **network_kwargs,
    )
    policy = _ObsNormPolicy(inner_policy) if policy_obfilter else inner_policy

    def net_tree(p):  # the flax tree split_params understands
        return p["pi"] if policy_obfilter else p

    def with_net(base, net):  # rebuild full params around a new flax tree
        return dict(base, pi=net) if policy_obfilter else net
    disc = Discriminator(hidden_size=adversary_hidden_size)

    key = seed_key(seed)
    key, kreset, kinit, kd = jax.random.split(key, 4)
    obs, env_state = venv.reset(kreset)
    params = policy.init(kinit, obs)
    ac_dim = (
        venv.action_space.shape[-1]
        if hasattr(venv.action_space, "shape") and venv.action_space.shape
        else 1
    )
    d_params = disc.init(kd, obs[:1].astype(jnp.float32), jnp.zeros((1, ac_dim)))
    if pretrained:
        if policy_obfilter:
            # behavior_clone runs through the same obfilter; seed its
            # statistics from the expert observations it will consume
            params = dict(
                params, ob_rms=params["ob_rms"].update(expert_dataset.obs)
            )
        key, kbc = jax.random.split(key)
        params = pretrain_bc(policy, params, expert_dataset, kbc, max_iters=bc_max_iters)

    vf_tx = optax.adam(vf_stepsize)
    d_tx = optax.adam(d_stepsize)
    _, vf0 = split_params(net_tree(params))

    def pd_of_with(base, pol_params, vf_params, o):
        full = with_net(base, merge_params(pol_params, vf_params))
        pdflat, vf, _ = policy.apply(full, o)
        return policy.pdtype.pdfromflat(pdflat), vf

    def update_fn(state: GAILTrainState, exp_obs, exp_acs):
        key, env_state, obs, _, last_done, traj, last_value = run_rollout(
            policy, venv, state.params, state.key, state.env_state, state.obs,
            None, state.last_done, nsteps,
        )
        ob = _flat01(traj.obs)
        ac = _flat01(traj.actions)
        ac2 = ac if ac.ndim > 1 else ac[:, None].astype(jnp.float32)
        if hasattr(venv.action_space, "low"):
            # the discriminator judges the EXECUTED action (envs clip Box
            # actions, cmd_util.py:96-99) — unbounded raw actions would let
            # the generator exploit disc extrapolation far off-distribution
            ac2 = jnp.clip(
                ac2,
                jnp.asarray(venv.action_space.low),
                jnp.asarray(venv.action_space.high),
            )

        # the discriminator compares against RAW expert obs, so undo the
        # env's VecNormalize transform on the generator rollout (end-of-
        # rollout statistics; within-rollout drift is negligible after the
        # first few iterations, and the disc's own obs_rms absorbs scale).
        # epsilon comes from the actual wrapper, not an assumed default;
        # the clipob clamp is NOT invertible — obs that saturated ±clipob
        # reconstruct to the clip boundary's raw value (the disc's own
        # obs_rms absorbs the residual; exact only within ±clipob)
        from baselines_tpu.envs.vec import find_normalize_state

        ns = find_normalize_state(env_state)
        if ns is not None:
            eps = norm_wrapper.epsilon if norm_wrapper is not None else 1e-8
            disc_ob = ob * jnp.sqrt(ns.ob_rms.var + eps) + ns.ob_rms.mean
        else:
            disc_ob = ob

        # adversary reward replaces env reward (gail/trpo_mpi.py)
        adv_rew = adversary_reward(disc, state.d_params, state.d_obs_rms, disc_ob, ac2)
        rewards = adv_rew.reshape(nsteps, nenvs)
        advs, tdlamret = gae(
            rewards, traj.values, traj.dones, last_value, gamma, lam
        )
        atarg = _flat01(advs)
        ret = _flat01(tdlamret)
        old_neglogp = _flat01(traj.neglogps)
        atarg = (atarg - atarg.mean()) / (atarg.std() + 1e-8)

        # reference trpo_mpi.py: pi.ob_rms.update(ob) with the fresh raw
        # rollout before computing the update; old and new pds share the
        # updated filter so the KL measures only the parameter change
        base_params = state.params
        if policy_obfilter:
            base_params = dict(
                base_params, ob_rms=base_params["ob_rms"].update(ob)
            )
        pd_of = lambda p, v, o: pd_of_with(base_params, p, v, o)
        pol_params, vf_params = split_params(net_tree(base_params))
        old_pdflat, _, _ = policy.apply(base_params, ob)
        old_pdflat = jax.lax.stop_gradient(old_pdflat)

        def losses_fn(pp):
            pd, _ = pd_of(pp, vf_params, ob)
            neglogp = pd.neglogp(ac)
            ratio = jnp.exp(old_neglogp - neglogp)
            surrgain = jnp.mean(ratio * atarg)
            meankl = jnp.mean(policy.pdtype.pdfromflat(old_pdflat).kl(pd))
            optimgain = surrgain + ent_coef * jnp.mean(pd.entropy())
            return optimgain, meankl

        (gain0, kl0), g_tree = jax.value_and_grad(losses_fn, has_aux=True)(pol_params)
        g = flatten_tree(g_tree)

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
        th_before = flatten_tree(pol_params)

        def probe(k):
            stepsize = 0.5**k
            th_new = th_before + fullstep * stepsize
            gain, kl = losses_fn(unflatten_like(th_new, pol_params))
            ok = jnp.isfinite(gain) & (gain - gain0 > 0) & (kl <= max_kl * 1.5)
            return ok, th_new

        oks, th_news = jax.vmap(probe)(jnp.arange(10, dtype=jnp.float32))
        any_ok = jnp.any(oks)
        th_final = jnp.where(any_ok, th_news[jnp.argmax(oks)], th_before)
        pol_params = unflatten_like(th_final, pol_params)
        # post-step diagnostics (the reference logs surr/kl AFTER the line
        # search, trpo_mpi.py:281-284; the pre-step values are ~0 by
        # construction and say nothing)
        gain_after, kl_after = losses_fn(pol_params)

        # vf fit
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
                grads = jax.grad(vf_loss_fn)(vfp, *x)
                updates, opt = vf_tx.update(grads, opt, vfp)
                return (optax.apply_updates(vfp, updates), opt), None

            return jax.lax.scan(mb, (vfp, opt), (ob_sh, ret_sh))

        key, *ekeys = jax.random.split(key, vf_iters + 1)
        (vf_params, vf_opt), _ = jax.lax.scan(
            vf_epoch, (vf_params, state.vf_opt), jnp.stack(ekeys)
        )

        # discriminator round: the reference interleaves g_step policy
        # updates per ONE discriminator round (trpo_mpi.py:245,313-326) — a
        # 1:1 cadence over-trains the discriminator to saturation and kills
        # the reward signal (observed: d_acc ~0.99 and no policy motion).
        # Gate the round on the iteration counter; its obs_rms sees BOTH
        # classes (trpo_mpi.py:323 updates with concat(gen, expert)).
        def d_round(args):
            d_params, d_opt, d_obs_rms = args
            d_obs_rms = d_obs_rms.update(
                jnp.concatenate(
                    [disc_ob.astype(jnp.float32), exp_obs.astype(jnp.float32)], 0
                )
            )

            def d_update(carry, _):
                d_params, d_opt = carry
                (loss, accs), grads = jax.value_and_grad(
                    lambda dp: adversary_loss(
                        disc, dp, d_obs_rms, disc_ob.astype(jnp.float32), ac2,
                        exp_obs.astype(jnp.float32), exp_acs, adversary_entcoeff,
                    ),
                    has_aux=True,
                )(d_params)
                updates, d_opt = d_tx.update(grads, d_opt, d_params)
                return (optax.apply_updates(d_params, updates), d_opt), accs

            (d_params, d_opt), accs = jax.lax.scan(
                d_update, (d_params, d_opt), None, length=d_step
            )
            mean_accs = jax.tree_util.tree_map(jnp.mean, accs)
            return d_params, d_opt, d_obs_rms, mean_accs

        def d_skip(args):
            # explicit sentinel (not NaN): (g_step-1)/g_step of iterations
            # skip the discriminator round, and NaN accs would poison any
            # downstream mean/plot over progress.csv's d_*_acc columns
            d_params, d_opt, d_obs_rms = args
            return d_params, d_opt, d_obs_rms, {
                "gen_acc": jnp.float32(-1.0), "exp_acc": jnp.float32(-1.0)
            }

        d_params, d_opt, d_obs_rms, accs = jax.lax.cond(
            (state.iters + 1) % g_step == 0,
            d_round,
            d_skip,
            (state.d_params, state.d_opt, state.d_obs_rms),
        )

        metrics = {
            "optimgain": gain_after,
            "meankl": kl_after,
            "adversary_reward_mean": jnp.mean(adv_rew),
            "true_reward_mean": jnp.mean(traj.rewards),
            "d_gen_acc": accs["gen_acc"],
            "d_exp_acc": accs["exp_acc"],
            "linesearch_success": any_ok.astype(jnp.float32),
        }
        new_state = GAILTrainState(
            params=with_net(base_params, merge_params(pol_params, vf_params)),
            vf_opt=vf_opt,
            d_params=d_params,
            d_opt=d_opt,
            d_obs_rms=d_obs_rms,
            key=key,
            env_state=env_state,
            obs=obs,
            last_done=last_done,
            iters=state.iters + 1,
        )
        return new_state, metrics

    state = dealias(
        GAILTrainState(
            params=params,
            vf_opt=vf_tx.init(vf0),
            d_params=d_params,
            d_opt=d_tx.init(d_params),
            d_obs_rms=RunningMeanStd.create(obs.shape[1:]),
            key=key,
            env_state=env_state,
            obs=obs,
            last_done=jnp.zeros((nenvs,), bool),
            iters=jnp.zeros((), jnp.int32),
        )
    )

    update = jax.jit(update_fn, donate_argnums=0)
    model = _GAILModel(
        policy,
        state,
        extra={
            "legacy_policy_builder": (
                (
                    lambda nh: build_policy(
                        venv.observation_space, venv.action_space, network,
                        value_network="copy",
                        **{**network_kwargs, "num_hidden": nh},
                    )
                )
                if network == "mlp"
                else None
            )
        },
    )
    if load_path is not None:
        model.load(load_path)
        state = model.state

    tstart = time.time()
    for it in range(1, niters + 1):
        key2 = jax.random.fold_in(jax.random.PRNGKey(seed or 0), it)
        exp_obs, exp_acs = expert_dataset.sample(key2, nbatch)
        state, metrics = update(state, exp_obs, exp_acs)
        if log_interval and (it % log_interval == 0 or it == 1):
            metrics = jax.device_get(metrics)
            stats = VecMonitor.get_stats(state.env_state)
            logger.logkv("iters", it)
            logger.logkv("timesteps", it * nbatch)
            logger.logkv("EpTrueRewMean", float(stats.mean_return))
            logger.logkv("fps", int(it * nbatch / (time.time() - tstart)))
            for k, v in metrics.items():
                logger.logkv(k, float(v))
            logger.dumpkvs()
    model.state = state
    return model
