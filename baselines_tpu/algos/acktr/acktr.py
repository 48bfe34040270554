"""ACKTR — A2C-style loss with a K-FAC natural-gradient optimizer, parity
with baselines/acktr.

Learner parity (acktr/acktr.py:18-158): training loss = E[ADV·(-logπ)] -
ent_coef·H + vf_coef·MSE(V,R) (:40-44); Fisher loss = -E[-logπ(a)] +
vf Gauss-Newton sampling term vf_fisher_coef·(V - sg(V+ξ))² (:47-51);
KfacOptimizer(lr=0.25 annealed linearly, clip_kl=0.001, momentum 0.9,
kfac_update=1, epsilon=0.01, stats_decay=0.99, cold_iter=10,
max_grad_norm=0.5) (:58-64); nsteps=20 rollouts with n-step returns.

The policy network is an explicit dense stack (KfacPolicyNet) so K-FAC
factor registration is structural rather than graph-scraped; conv K-FAC
factors (used by the reference on Atari) are future work — dense layers on
top of any latent cover the CartPole/identity/MuJoCo parity surface.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from baselines_tpu.algos.acktr.kfac import (
    KFACState,
    init_kfac,
    precondition_layer,
    update_eigs,
    update_stats,
)
from baselines_tpu.algos.common import Model, build_env, dealias
from baselines_tpu.core import logger
from baselines_tpu.core.math import explained_variance, global_norm
from baselines_tpu.core.rng import seed_key
from baselines_tpu.data.gae import nstep_returns
from baselines_tpu.envs.spaces import Box
from baselines_tpu.envs.vec import VecMonitor
from baselines_tpu.nn.distributions import make_pdtype
from baselines_tpu.nn.policy import encode_observation


def _ortho(key, shape, scale):
    w = jax.random.normal(key, shape)
    q, r = jnp.linalg.qr(w if shape[0] >= shape[1] else w.T)
    q = q if shape[0] >= shape[1] else q.T
    return scale * q[: shape[0], : shape[1]]


class KfacPolicyNet:
    """Explicit dense stack: obs -> hidden tanh layers -> (pi head, vf head).
    Params: {"layers": [(W,b)..], "pi": (W,b), "vf": (W,b), ["logstd"]}.
    Forward returns per-dense-layer (input, pre-activation) taps for K-FAC.
    """

    def __init__(self, ob_space, ac_space, num_hidden=64, num_layers=2):
        self.ob_space = ob_space
        self.ac_space = ac_space
        self.pdtype = make_pdtype(ac_space)
        self.num_hidden = num_hidden
        self.num_layers = num_layers
        self.continuous = isinstance(ac_space, Box)
        probe = encode_observation(ob_space, self._dummy_obs())
        self.obs_dim = int(np.prod(probe.shape[1:]))
        if self.continuous:
            self.pi_dim = self.pdtype.param_size // 2
        else:
            self.pi_dim = self.pdtype.param_size
        # (din, dout) for K-FAC factor allocation: hiddens + pi + vf
        self.layer_dims = (
            [(self.obs_dim, num_hidden)]
            + [(num_hidden, num_hidden)] * (num_layers - 1)
            + [(num_hidden, self.pi_dim), (num_hidden, 1)]
        )

    def _dummy_obs(self):
        from baselines_tpu.envs.spaces import Discrete

        if isinstance(self.ob_space, Discrete):
            return jnp.zeros((1,), jnp.int32)
        return jnp.zeros((1,) + self.ob_space.shape)

    def init(self, key):
        keys = jax.random.split(key, self.num_layers + 2)
        layers = []
        din = self.obs_dim
        for i in range(self.num_layers):
            layers.append(
                (
                    _ortho(keys[i], (din, self.num_hidden), np.sqrt(2.0)),
                    jnp.zeros((self.num_hidden,)),
                )
            )
            din = self.num_hidden
        params = {
            "layers": layers,
            "pi": (
                _ortho(keys[-2], (din, self.pi_dim), 0.01),
                jnp.zeros((self.pi_dim,)),
            ),
            "vf": (_ortho(keys[-1], (din, 1), 1.0), jnp.zeros((1,))),
        }
        if self.continuous:
            params["logstd"] = jnp.zeros((1, self.pi_dim))
        return params

    def forward(self, params, obs, taps=None):
        """Returns (pdflat, vf, acts) where acts[i] is the input to dense
        layer i; `taps` (same structure as pre-activations) enables dL/ds
        extraction via grad-wrt-taps."""
        x = encode_observation(self.ob_space, obs)
        x = x.reshape((x.shape[0], -1))
        acts = []
        k = 0
        for W, b in params["layers"]:
            acts.append(x)
            s = x @ W + b
            if taps is not None:
                s = s + taps[k]
            k += 1
            x = jnp.tanh(s)
        acts.append(x)
        s_pi = x @ params["pi"][0] + params["pi"][1]
        if taps is not None:
            s_pi = s_pi + taps[k]
        k += 1
        acts.append(x)
        s_vf = x @ params["vf"][0] + params["vf"][1]
        if taps is not None:
            s_vf = s_vf + taps[k]
        vf = s_vf[:, 0]
        if self.continuous:
            pdflat = jnp.concatenate(
                [s_pi, jnp.broadcast_to(params["logstd"], s_pi.shape)], axis=-1
            )
        else:
            pdflat = s_pi
        return pdflat, vf, acts

    def zero_taps(self, batch: int):
        return [
            jnp.zeros((batch, dout)) for _, dout in self.layer_dims
        ]

    def layer_grads(self, grads):
        """Flatten param grads into per-K-FAC-layer (gW, gb) list + rest."""
        out = [(W, b) for W, b in grads["layers"]]
        out.append(grads["pi"])
        out.append(grads["vf"])
        return out

    def set_layer_params(self, params, new_list):
        nl = len(params["layers"])
        out = dict(params)
        out["layers"] = [tuple(x) for x in new_list[:nl]]
        out["pi"] = tuple(new_list[nl])
        out["vf"] = tuple(new_list[nl + 1])
        return out


class KfacPolicy:
    """Policy surface over KfacPolicyNet for Model/evaluate."""

    is_recurrent = False

    def __init__(self, net: KfacPolicyNet):
        self.net = net
        self.pdtype = net.pdtype

    def initial_state(self, batch_size):
        return None

    def apply(self, params, obs, rnn_state=None, rnn_mask=None):
        pdflat, vf, _ = self.net.forward(params, obs)
        return pdflat, vf, None

    def pd(self, params, obs, rnn_state=None, rnn_mask=None):
        pdflat, vf, _ = self.net.forward(params, obs)
        return self.pdtype.pdfromflat(pdflat), vf, None

    def step(self, params, key, obs, rnn_state=None, rnn_mask=None):
        pd, vf, _ = self.pd(params, obs)
        a = pd.sample(key)
        return a, vf, pd.neglogp(a), None

    def mode_step(self, params, obs, rnn_state=None, rnn_mask=None):
        pd, vf, _ = self.pd(params, obs)
        return pd.mode(), vf, None

    def value(self, params, obs, rnn_state=None, rnn_mask=None):
        _, vf, _ = self.net.forward(params, obs)
        return vf


@struct.dataclass
class ACKTRTrainState:
    params: Any
    kfac: KFACState
    key: jax.Array
    env_state: Any
    obs: Any
    update_idx: jnp.ndarray


def learn(
    *,
    env=None,
    env_id: str | None = None,
    network: str = "mlp",
    total_timesteps: int,
    seed: int | None = None,
    num_envs: int = 8,
    nsteps: int = 20,
    gamma: float = 0.99,
    ent_coef: float = 0.01,
    vf_coef: float = 0.5,
    vf_fisher_coef: float = 1.0,
    lr: float = 0.25,
    max_grad_norm: float = 0.5,
    kfac_clip: float = 0.001,
    lrschedule: str = "linear",
    epsilon: float = 0.01,
    stats_decay: float = 0.99,
    momentum: float = 0.9,
    cold_iter: int = 10,
    kfac_update: int = 1,
    log_interval: int = 100,
    load_path: str | None = None,
    num_hidden: int = 64,
    num_layers: int = 2,
    mesh=None,
    **network_kwargs,
) -> Model:
    """acktr.learn analog (acktr/acktr.py:95-158 signature/defaults)."""
    assert network == "mlp", (
        "acktr currently supports dense K-FAC (network='mlp'); conv factors TBD"
    )
    venv = env if env is not None else build_env(env_id, num_envs)
    nenvs = venv.num_envs
    nbatch = nenvs * nsteps
    nupdates = max(total_timesteps // nbatch, 1)

    net = KfacPolicyNet(
        venv.observation_space, venv.action_space, num_hidden, num_layers
    )
    policy = KfacPolicy(net)

    key = seed_key(seed)
    key, kreset, kinit = jax.random.split(key, 3)
    obs, env_state = venv.reset(kreset)
    params = net.init(kinit)

    def rollout(params, key, env_state, obs):
        def body(carry, _):
            key, env_state, obs = carry
            key, kact, kstep = jax.random.split(key, 3)
            action, value, neglogp, _ = policy.step(params, kact, obs)
            nobs, nstate, rew, done, _ = venv.step(kstep, env_state, action)
            return (key, nstate, nobs), (obs, action, value, rew, done)

        (key, env_state, obs), (obs_t, act_t, val_t, rew_t, done_t) = jax.lax.scan(
            body, (key, env_state, obs), None, length=nsteps
        )
        last_value = policy.value(params, obs)
        return key, env_state, obs, obs_t, act_t, val_t, rew_t, done_t, last_value

    def train_loss(params, ob, ac, adv, ret):
        pdflat, vf, _ = net.forward(params, ob)
        pd = net.pdtype.pdfromflat(pdflat)
        neglogpac = pd.neglogp(ac)
        pg_loss = jnp.mean(adv * neglogpac)
        entropy = jnp.mean(pd.entropy())
        vf_loss = jnp.mean(jnp.square(vf - ret))
        return pg_loss - ent_coef * entropy + vf_coef * vf_loss, (
            pg_loss, vf_loss, entropy,
        )

    def fisher_loss(params, taps, ob, ac, vf_noise):
        """acktr.py:47-51: pg fisher on batch actions + vf Gauss-Newton."""
        pdflat, vf, _ = net.forward(params, ob, taps)
        pd = net.pdtype.pdfromflat(pdflat)
        pg_fisher = -jnp.mean(pd.neglogp(ac))
        sample_net = vf + vf_noise
        vf_fisher = -vf_fisher_coef * jnp.mean(
            jnp.square(vf - jax.lax.stop_gradient(sample_net))
        )
        return pg_fisher + vf_fisher

    def update_fn(state: ACKTRTrainState):
        frac = 1.0 - state.update_idx.astype(jnp.float32) / nupdates
        lr_now = jnp.float32(lr) * (frac if lrschedule == "linear" else 1.0)

        key, env_state, obs, obs_t, act_t, val_t, rew_t, done_t, last_value = rollout(
            state.params, state.key, state.env_state, state.obs
        )
        returns = nstep_returns(rew_t, done_t, last_value, gamma)

        ob = obs_t.reshape((-1,) + obs_t.shape[2:])
        ac = act_t.reshape((-1,) + act_t.shape[2:])
        ret = returns.reshape(-1)
        val = val_t.reshape(-1)
        adv = ret - val

        (loss, (pg_loss, vf_loss, entropy)), grads = jax.value_and_grad(
            train_loss, has_aux=True
        )(state.params, ob, ac, adv, ret)

        # fisher statistics pass
        key, knoise = jax.random.split(key)
        taps = net.zero_taps(nbatch)
        vf_noise = jax.random.normal(knoise, (nbatch,))
        _, _, acts = net.forward(state.params, ob)
        ds = jax.grad(fisher_loss, argnums=1)(state.params, taps, ob, ac, vf_noise)
        kfac = update_stats(state.kfac, acts, ds, stats_decay)
        kfac = jax.lax.cond(
            kfac.step % kfac_update == 0,
            update_eigs,
            lambda s: s,
            kfac,
        )

        # precondition the training grads layer-wise
        layer_grads = net.layer_grads(grads)
        precond = [
            precondition_layer(l, gW, gb, epsilon)
            for l, (gW, gb) in zip(kfac.layers, layer_grads)
        ]
        # KL trust-radius clip (kfac.py:618-801): vFv ≈ Σ precond·grad · lr²
        vFv = sum(
            jnp.sum(pW * gW) + jnp.sum(pb * gb)
            for (pW, pb), (gW, gb) in zip(precond, layer_grads)
        )
        scale = jnp.minimum(
            1.0, jnp.sqrt(kfac_clip / jnp.maximum(vFv * lr_now**2, 1e-12))
        )

        # assemble full preconditioned grad tree (logstd gets the raw grad)
        precond_tree = net.set_layer_params(
            jax.tree_util.tree_map(lambda x: x, grads),
            [(pW * scale, pb * scale) for pW, pb in precond],
        )
        # cold start: plain SGD direction for the first cold_iter updates
        use_cold = kfac.step < cold_iter
        direction = jax.tree_util.tree_map(
            lambda p, g: jnp.where(use_cold, g, p), precond_tree, grads
        )
        # max_grad_norm clip on the direction
        gnorm = global_norm(direction)
        clip_coef = jnp.minimum(1.0, max_grad_norm / jnp.maximum(gnorm, 1e-8))
        direction = jax.tree_util.tree_map(lambda d: d * clip_coef, direction)
        # momentum SGD
        new_momentum = jax.tree_util.tree_map(
            lambda m, d: momentum * m + d, kfac.momentum, direction
        )
        new_params = jax.tree_util.tree_map(
            lambda p, m: p - lr_now * m, state.params, new_momentum
        )
        kfac = kfac.replace(momentum=new_momentum, step=kfac.step + 1)

        metrics = {
            "policy_loss": pg_loss,
            "value_loss": vf_loss,
            "policy_entropy": entropy,
            "explained_variance": explained_variance(val, ret),
        }
        return (
            ACKTRTrainState(
                params=new_params, kfac=kfac, key=key, env_state=env_state,
                obs=obs, update_idx=state.update_idx + 1,
            ),
            metrics,
        )

    state = dealias(
        ACKTRTrainState(
            params=params,
            kfac=init_kfac(net.layer_dims, params),
            key=key,
            env_state=env_state,
            obs=obs,
            update_idx=jnp.zeros((), jnp.int32),
        )
    )
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
        if log_interval and (upd % log_interval == 0 or upd == 1):
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
