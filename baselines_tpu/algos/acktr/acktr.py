"""ACKTR — A2C-style loss with a K-FAC natural-gradient optimizer, parity
with baselines/acktr.

Learner parity (acktr/acktr.py:18-158): training loss = E[ADV·(-logπ)] -
ent_coef·H + vf_coef·MSE(V,R) (:40-44); Fisher loss = -E[-logπ(a)] +
vf Gauss-Newton sampling term vf_fisher_coef·(V - sg(V+ξ))² (:47-51);
KfacOptimizer(lr=0.25 annealed linearly, clip_kl=0.001, momentum 0.9,
kfac_update=1, epsilon=0.01, stats_decay=0.99, cold_iter=10,
max_grad_norm=0.5) (:58-64); nsteps=20 rollouts with n-step returns.

The policy network is an explicit layer stack (KfacPolicyNet) so K-FAC
factor registration is structural rather than graph-scraped.  Both dense
factors and conv KFC factors (patch-covariance approximation, the
reference's kfac.py conv path used on Atari) are implemented — see
`precondition_layer` / the conv factor code below (:61-185) and
kfac.py's factor update rules.
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


class _DenseSpec:
    kind = "dense"

    def __init__(self, din, dout, act):
        self.din, self.dout, self.act = din, dout, act
        self.factor_dims = (din, dout)


class _ConvSpec:
    kind = "conv"

    def __init__(self, k, stride, cin, cout, hin, win, act):
        self.k, self.stride, self.cin, self.cout = k, stride, cin, cout
        self.hout = (hin - k) // stride + 1
        self.wout = (win - k) // stride + 1
        # conv_general_dilated_patches orders the patch vector (cin, kh, kw)
        self.factor_dims = (cin * k * k, cout)
        self.act = act


_ACTS = {"tanh": jnp.tanh, "relu": jax.nn.relu, None: lambda x: x}


class KfacPolicyNet:
    """Explicit layer stack (dense or conv trunk) -> (pi head, vf head) with
    structural K-FAC factor registration.

    Params: {"layers": [(W,b)..], "pi": (W,b), "vf": (W,b), ["logstd"]}.
    Dense layers use the classic Kronecker factors; conv layers use KFC
    (im2col patches × per-location grads — see kfac.py module docstring).
    network ∈ {"mlp", "cnn", "cnn_small"} mirrors the reference acktr's
    policy surface (acktr/acktr.py:95 `network` kwarg → models.py builders).
    """

    def __init__(
        self, ob_space, ac_space, network="mlp", num_hidden=64, num_layers=2
    ):
        self.ob_space = ob_space
        self.ac_space = ac_space
        self.network = network
        self.pdtype = make_pdtype(ac_space)
        self.continuous = isinstance(ac_space, Box)
        if self.continuous:
            self.pi_dim = self.pdtype.param_size // 2
        else:
            self.pi_dim = self.pdtype.param_size
        probe = encode_observation(ob_space, self._dummy_obs())
        specs = []
        if network == "mlp":
            self.conv_input = False
            din = int(np.prod(probe.shape[1:]))
            for _ in range(num_layers):
                specs.append(_DenseSpec(din, num_hidden, "tanh"))
                din = num_hidden
        elif network in ("cnn", "cnn_small"):
            if probe.ndim != 4:
                raise ValueError(f"acktr network={network!r} needs HWC image obs")
            self.conv_input = True
            h, w, c = probe.shape[1:]
            stack = (
                [(32, 8, 4), (64, 4, 2), (64, 3, 1)]
                if network == "cnn"
                else [(8, 8, 4), (16, 4, 2)]
            )
            for cout, k, stride in stack:
                spec = _ConvSpec(k, stride, c, cout, h, w, "relu")
                specs.append(spec)
                h, w, c = spec.hout, spec.wout, cout
            din = h * w * c
            specs.append(_DenseSpec(din, 512 if network == "cnn" else 128, "relu"))
            din = specs[-1].dout
        elif network == "cnn_s2d":
            # space-to-depth-packed Nature geometry (envs/vec.py VecS2D,
            # nn/networks.py NatureCNNS2D): conv1 8x8/s4 on 84x84x4 is the
            # weight-equivalent 2x2/s1 on 21x21x64; KFC factor registration
            # is shape-generic so only the stack geometry differs
            if probe.ndim != 4:
                raise ValueError("acktr network='cnn_s2d' needs HWC image obs")
            self.conv_input = True
            h, w, c = probe.shape[1:]
            for cout, k, stride in [(32, 2, 1), (64, 4, 2), (64, 3, 1)]:
                spec = _ConvSpec(k, stride, c, cout, h, w, "relu")
                specs.append(spec)
                h, w, c = spec.hout, spec.wout, cout
            din = h * w * c
            specs.append(_DenseSpec(din, 512, "relu"))
            din = specs[-1].dout
        else:
            raise ValueError(
                f"acktr supports network in ('mlp','cnn','cnn_small','cnn_s2d'),"
                f" got {network!r}"
            )
        specs.append(_DenseSpec(din, self.pi_dim, None))  # pi head
        specs.append(_DenseSpec(din, 1, None))  # vf head
        self.specs = specs
        self.layer_dims = [s.factor_dims for s in specs]

    def _dummy_obs(self):
        from baselines_tpu.envs.spaces import Discrete

        if isinstance(self.ob_space, Discrete):
            return jnp.zeros((1,), jnp.int32)
        return jnp.zeros((1,) + self.ob_space.shape, self.ob_space.dtype)

    def _encode(self, obs):
        x = encode_observation(self.ob_space, obs)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        else:
            x = x.astype(jnp.float32)
        if not self.conv_input:
            x = x.reshape((x.shape[0], -1))
        return x

    def _init_weight(self, key, spec, scale):
        if spec.kind == "dense":
            return _ortho(key, (spec.din, spec.dout), scale)
        fdin = spec.cin * spec.k * spec.k
        w = _ortho(key, (fdin, spec.cout), scale)
        return w.reshape(spec.cin, spec.k, spec.k, spec.cout).transpose(1, 2, 0, 3)

    def init(self, key):
        keys = jax.random.split(key, len(self.specs))
        layers = []
        for i, spec in enumerate(self.specs[:-2]):
            layers.append(
                (
                    self._init_weight(keys[i], spec, np.sqrt(2.0)),
                    jnp.zeros((spec.factor_dims[1],)),
                )
            )
        params = {
            "layers": layers,
            "pi": (
                self._init_weight(keys[-2], self.specs[-2], 0.01),
                jnp.zeros((self.pi_dim,)),
            ),
            "vf": (self._init_weight(keys[-1], self.specs[-1], 1.0), jnp.zeros((1,))),
        }
        if self.continuous:
            params["logstd"] = jnp.zeros((1, self.pi_dim))
        return params

    def _apply_layer(self, spec, W, b, x, tap):
        if spec.kind == "conv":
            s = jax.lax.conv_general_dilated(
                x, W, (spec.stride, spec.stride), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
        else:
            if x.ndim > 2:
                x = x.reshape((x.shape[0], -1))
            s = x @ W + b
        if tap is not None:
            s = s + tap
        return x, s  # x is the (possibly flattened) layer input

    def forward(self, params, obs, taps=None):
        """Returns (pdflat, vf, acts) where acts[i] is the input to layer i
        (2D for dense, NHWC for conv); `taps` (same structure as
        pre-activations) enables dL/ds extraction via grad-wrt-taps."""
        x = self._encode(obs)
        acts = []
        for i, (spec, (W, b)) in enumerate(zip(self.specs[:-2], params["layers"])):
            tap = taps[i] if taps is not None else None
            a_in, s = self._apply_layer(spec, W, b, x, tap)
            acts.append(a_in)
            x = _ACTS[spec.act](s)
        k = len(self.specs) - 2
        a_in, s_pi = self._apply_layer(
            self.specs[-2], *params["pi"], x, taps[k] if taps is not None else None
        )
        acts.append(a_in)
        a_in, s_vf = self._apply_layer(
            self.specs[-1], *params["vf"], x, taps[k + 1] if taps is not None else None
        )
        acts.append(a_in)
        vf = s_vf[:, 0]
        if self.continuous:
            pdflat = jnp.concatenate(
                [s_pi, jnp.broadcast_to(params["logstd"], s_pi.shape)], axis=-1
            )
        else:
            pdflat = s_pi
        return pdflat, vf, acts

    def zero_taps(self, batch: int):
        out = []
        for spec in self.specs:
            if spec.kind == "conv":
                out.append(jnp.zeros((batch, spec.hout, spec.wout, spec.cout)))
            else:
                out.append(jnp.zeros((batch, spec.factor_dims[1])))
        return out

    def layer_stats(self, acts, ds):
        """(a2d, g2d) row matrices per layer for kfac.update_stats.

        Dense: rows are samples, per-sample grads = B·(mean-loss grads).
        Conv (KFC): rows are (sample, location) pairs — im2col patches and
        per-location grads; the |T| factor of F ≈ |T|·A⊗S is folded into
        the grad rows as √T.
        """
        batch = ds[-1].shape[0]
        rows = []
        for spec, a, g in zip(self.specs, acts, ds):
            if spec.kind == "conv":
                p = jax.lax.conv_general_dilated_patches(
                    a, (spec.k, spec.k), (spec.stride, spec.stride), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                t = spec.hout * spec.wout
                rows.append(
                    (
                        p.reshape(-1, spec.factor_dims[0]),
                        g.reshape(-1, spec.cout) * (batch * np.sqrt(t)),
                    )
                )
            else:
                rows.append((a, g * batch))
        return rows

    def precondition(self, kfac_layers, layer_grads, epsilon):
        """F⁻¹g per layer, returning (pW, pb) in parameter shapes."""
        out = []
        for spec, layer, (gW, gb) in zip(self.specs, kfac_layers, layer_grads):
            if spec.kind == "conv":
                g2 = gW.transpose(2, 0, 1, 3).reshape(spec.factor_dims[0], spec.cout)
                pW2, pb = precondition_layer(layer, g2, gb, epsilon)
                pW = pW2.reshape(spec.cin, spec.k, spec.k, spec.cout).transpose(
                    1, 2, 0, 3
                )
            else:
                pW, pb = precondition_layer(layer, gW, gb, epsilon)
            out.append((pW, pb))
        return out

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
    env_kwargs: dict | None = None,
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
    venv = env if env is not None else build_env(env_id, num_envs, **(env_kwargs or {}))
    nenvs = venv.num_envs
    nbatch = nenvs * nsteps
    nupdates = max(total_timesteps // nbatch, 1) if total_timesteps > 0 else 0

    net = KfacPolicyNet(
        venv.observation_space, venv.action_space, network, num_hidden, num_layers
    )
    policy = KfacPolicy(net)


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
        kfac = update_stats(state.kfac, net.layer_stats(acts, ds), stats_decay)
        kfac = jax.lax.cond(
            kfac.step % kfac_update == 0,
            update_eigs,
            lambda s: s,
            kfac,
        )

        # precondition the training grads layer-wise
        layer_grads = net.layer_grads(grads)
        precond = net.precondition(kfac.layers, layer_grads, epsilon)
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

    def make_state(key):
        key, kreset, kinit = jax.random.split(key, 3)
        obs, env_state = venv.reset(kreset)
        params = net.init(kinit)
        return ACKTRTrainState(
            params=params,
            kfac=init_kfac(net.layer_dims, params),
            key=key,
            env_state=env_state,
            obs=obs,
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
