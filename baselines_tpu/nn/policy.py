"""Policy builder — parity with baselines/common/policies.py.

`build_policy` (policies.py:121-179 analog) assembles: observation encoding
(input.py:43-63 — Discrete→one-hot, Box→float, MultiDiscrete→concat of
one-hots), a latent network from the zoo, an optional separate value network
('copy') or a shared one (policies.py:132-142), the distribution head with
init scale 0.01, and a value head (or a Q head when estimate_q,
policies.py:58-64).

The result is a `Policy`: a thin functional bundle whose `step` returns
(action, value, neglogp, next_rnn_state) like PolicyWithValue.step
(policies.py:77-96) — but pure, so it vmaps over envs and scans over time
inside the jitted rollout.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from baselines_tpu.envs.spaces import Box, Discrete, MultiBinary, MultiDiscrete
from baselines_tpu.nn.distributions import make_pdtype
from baselines_tpu.nn.networks import get_network, ortho


def encode_observation(space, obs):
    """input.py:43-63 parity."""
    if isinstance(space, Discrete):
        return jax.nn.one_hot(obs, space.n, dtype=jnp.float32)
    if isinstance(space, MultiDiscrete):
        nvec = np.asarray(space.nvec).ravel()
        obs = obs.astype(jnp.int32)
        return jnp.concatenate(
            [jax.nn.one_hot(obs[..., i], int(n), dtype=jnp.float32) for i, n in enumerate(nvec)],
            axis=-1,
        )
    if isinstance(space, (Box, MultiBinary)):
        return obs  # networks handle uint8 → /255
    raise NotImplementedError(f"cannot encode observations for {space!r}")


class PolicyValueNet(nn.Module):
    """Latent network + pd head + value/Q head (PolicyWithValue analog)."""

    network: Any
    value_network: Any  # None => shared latent (policies.py:132-142)
    ob_space: Any
    ac_space: Any
    estimate_q: bool = False

    @nn.compact
    def __call__(self, obs, rnn_state=None, rnn_mask=None):
        pdtype = make_pdtype(self.ac_space)
        x = encode_observation(self.ob_space, obs)

        if getattr(self.network, "is_recurrent", False):
            latent, rnn_state = self.network(x, rnn_state, rnn_mask)
        else:
            latent = self.network(x)

        if self.value_network is not None:
            if getattr(self.value_network, "is_recurrent", False):
                raise NotImplementedError("recurrent value_network='copy' not supported")
            vlatent = self.value_network(x)
        else:
            vlatent = latent

        # distribution head, init scale 0.01 (policies.py pd head convention)
        if pdtype.kind == "diag_gaussian":
            dim = pdtype.param_size // 2
            mean = nn.Dense(dim, kernel_init=ortho(0.01), name="pi")(latent)
            logstd = self.param("logstd", nn.initializers.zeros, (1, dim))
            pdflat = jnp.concatenate(
                [mean, jnp.broadcast_to(logstd, mean.shape)], axis=-1
            )
        else:
            pdflat = nn.Dense(pdtype.param_size, kernel_init=ortho(0.01), name="pi")(latent)

        if self.estimate_q:
            assert isinstance(self.ac_space, Discrete)
            q = nn.Dense(self.ac_space.n, kernel_init=ortho(1.0), name="q")(vlatent)
            vf = q
        else:
            vf = nn.Dense(1, kernel_init=ortho(1.0), name="vf")(vlatent)[..., 0]

        return pdflat, vf, rnn_state


class Policy:
    """Functional bundle around PolicyValueNet."""

    def __init__(self, module: PolicyValueNet, ob_space, ac_space, is_recurrent: bool, rnn_size: int = 0):
        self.module = module
        self.ob_space = ob_space
        self.ac_space = ac_space
        self.pdtype = make_pdtype(ac_space)
        self.is_recurrent = is_recurrent
        self._rnn_size = rnn_size

    def initial_state(self, batch_size: int):
        if not self.is_recurrent:
            return None
        return jnp.zeros((batch_size, self._rnn_size), jnp.float32)

    def init(self, key, sample_obs):
        batch = sample_obs.shape[0] if hasattr(sample_obs, "shape") else 1
        rnn_state = self.initial_state(batch)
        mask = jnp.zeros((batch,), jnp.float32) if self.is_recurrent else None
        return self.module.init(key, sample_obs, rnn_state, mask)

    def apply(self, params, obs, rnn_state=None, rnn_mask=None):
        return self.module.apply(params, obs, rnn_state, rnn_mask)

    def pd(self, params, obs, rnn_state=None, rnn_mask=None):
        pdflat, vf, rnn_state = self.apply(params, obs, rnn_state, rnn_mask)
        return self.pdtype.pdfromflat(pdflat), vf, rnn_state

    def step(self, params, key, obs, rnn_state=None, rnn_mask=None):
        """(action, value, neglogp, next_rnn_state) — PolicyWithValue.step
        (policies.py:77-96)."""
        pd, vf, rnn_state = self.pd(params, obs, rnn_state, rnn_mask)
        action = pd.sample(key)
        neglogp = pd.neglogp(action)
        value = vf if not self.module.estimate_q else None
        return action, value, neglogp, rnn_state

    def mode_step(self, params, obs, rnn_state=None, rnn_mask=None):
        """Deterministic action (argmax/mean) for --play evaluation."""
        pd, vf, rnn_state = self.pd(params, obs, rnn_state, rnn_mask)
        return pd.mode(), vf, rnn_state

    def value(self, params, obs, rnn_state=None, rnn_mask=None):
        _, vf, _ = self.apply(params, obs, rnn_state, rnn_mask)
        return vf


def build_policy(
    ob_space,
    ac_space,
    network: str = "mlp",
    value_network: str | None = None,
    estimate_q: bool = False,
    **network_kwargs,
) -> Policy:
    """policies.build_policy analog (policies.py:121-179).

    value_network: None/'shared' share the latent; 'copy' builds an
    independent value tower of the same architecture.
    """
    if (
        isinstance(network, str)
        and network == "cnn_s2d"
        and getattr(ob_space, "packed_shape", None) is not None
    ):
        # flat-row packed obs (VecS2D flat=True): tell the net how to
        # unflatten — the reshape fuses into its uint8 cast
        network_kwargs.setdefault("packed_shape", tuple(ob_space.packed_shape))
    net = get_network(network, **network_kwargs)
    vnet = None
    if value_network == "copy":
        vnet = get_network(network, **network_kwargs)
    is_recurrent = bool(getattr(net, "is_recurrent", False))
    rnn_size = 2 * net.nlstm if is_recurrent else 0
    module = PolicyValueNet(
        network=net,
        value_network=vnet,
        ob_space=ob_space,
        ac_space=ac_space,
        estimate_q=estimate_q,
    )
    return Policy(module, ob_space, ac_space, is_recurrent, rnn_size)
