"""Action distributions.

Formula-level parity with baselines/common/distributions.py: CategoricalPd
(:153-204, numerically-stable entropy/kl and gumbel sampling),
MultiCategoricalPd (:206-225), DiagGaussianPd (:227-251), BernoulliPd
(:254-276), and the space→pdtype dispatch make_pdtype (:278-290).

A `Pd` wraps flat parameters (the `flatparam` convention) so distribution
objects are cheap pytree-transparent values usable inside jit; a `PdType`
knows the flat-parameter size and the sample shape/dtype for a given action
space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from baselines_tpu.envs.spaces import Box, Discrete, MultiBinary, MultiDiscrete


class Pd:
    def flatparam(self):
        raise NotImplementedError

    def mode(self):
        raise NotImplementedError

    def neglogp(self, x):
        raise NotImplementedError

    def kl(self, other):
        raise NotImplementedError

    def entropy(self):
        raise NotImplementedError

    def sample(self, key):
        raise NotImplementedError

    def logp(self, x):
        return -self.neglogp(x)


class CategoricalPd(Pd):
    def __init__(self, logits):
        self.logits = logits

    def flatparam(self):
        return self.logits

    def mode(self):
        return jnp.argmax(self.logits, axis=-1)

    def neglogp(self, x):
        """Sparse softmax cross-entropy (distributions.py:169-183)."""
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        onehot = jax.nn.one_hot(x, self.logits.shape[-1], dtype=logp.dtype)
        return -jnp.sum(onehot * logp, axis=-1)

    def kl(self, other):
        """Stable KL (distributions.py:184-191)."""
        a0 = self.logits - jnp.max(self.logits, axis=-1, keepdims=True)
        a1 = other.logits - jnp.max(other.logits, axis=-1, keepdims=True)
        ea0, ea1 = jnp.exp(a0), jnp.exp(a1)
        z0 = jnp.sum(ea0, axis=-1, keepdims=True)
        z1 = jnp.sum(ea1, axis=-1, keepdims=True)
        p0 = ea0 / z0
        return jnp.sum(p0 * (a0 - jnp.log(z0) - a1 + jnp.log(z1)), axis=-1)

    def entropy(self):
        """Stable entropy (distributions.py:192-198)."""
        a0 = self.logits - jnp.max(self.logits, axis=-1, keepdims=True)
        ea0 = jnp.exp(a0)
        z0 = jnp.sum(ea0, axis=-1, keepdims=True)
        p0 = ea0 / z0
        return jnp.sum(p0 * (jnp.log(z0) - a0), axis=-1)

    def sample(self, key):
        """Gumbel-max sampling (distributions.py:199-201)."""
        u = jax.random.uniform(key, self.logits.shape, self.logits.dtype, 1e-10, 1.0)
        return jnp.argmax(self.logits - jnp.log(-jnp.log(u)), axis=-1).astype(jnp.int32)


class MultiCategoricalPd(Pd):
    """Independent categoricals over a MultiDiscrete space
    (distributions.py:206-225)."""

    def __init__(self, nvec, flat):
        self.nvec = tuple(int(n) for n in np.asarray(nvec).ravel())
        self.flat = flat
        splits = np.cumsum(self.nvec)[:-1]
        self.categoricals = [
            CategoricalPd(l) for l in jnp.split(flat, splits, axis=-1)
        ]

    def flatparam(self):
        return self.flat

    def mode(self):
        return jnp.stack([p.mode() for p in self.categoricals], axis=-1)

    def neglogp(self, x):
        return sum(p.neglogp(x[..., i]) for i, p in enumerate(self.categoricals))

    def kl(self, other):
        return sum(p.kl(q) for p, q in zip(self.categoricals, other.categoricals))

    def entropy(self):
        return sum(p.entropy() for p in self.categoricals)

    def sample(self, key):
        keys = jax.random.split(key, len(self.categoricals))
        return jnp.stack(
            [p.sample(k) for p, k in zip(self.categoricals, keys)], axis=-1
        )


class DiagGaussianPd(Pd):
    """flat = concat(mean, logstd) on the last axis
    (distributions.py:227-251)."""

    def __init__(self, flat):
        self.flat = flat
        self.mean, self.logstd = jnp.split(flat, 2, axis=-1)
        self.std = jnp.exp(self.logstd)

    def flatparam(self):
        return self.flat

    def mode(self):
        return self.mean

    def neglogp(self, x):
        d = self.mean.shape[-1]
        return (
            0.5 * jnp.sum(jnp.square((x - self.mean) / self.std), axis=-1)
            + 0.5 * jnp.log(2.0 * jnp.pi) * d
            + jnp.sum(self.logstd, axis=-1)
        )

    def kl(self, other):
        return jnp.sum(
            other.logstd
            - self.logstd
            + (jnp.square(self.std) + jnp.square(self.mean - other.mean))
            / (2.0 * jnp.square(other.std))
            - 0.5,
            axis=-1,
        )

    def entropy(self):
        return jnp.sum(self.logstd + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)

    def sample(self, key):
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype
        )


class BernoulliPd(Pd):
    """Independent bernoullis from logits (distributions.py:254-276)."""

    def __init__(self, logits):
        self.logits = logits
        self.ps = jax.nn.sigmoid(logits)

    def flatparam(self):
        return self.logits

    def mode(self):
        return jnp.round(self.ps).astype(jnp.int32)

    def _bce(self, logits, labels):
        # sigmoid cross entropy with logits: max(x,0) - x*z + log(1+exp(-|x|))
        return (
            jnp.maximum(logits, 0.0)
            - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    def neglogp(self, x):
        return jnp.sum(self._bce(self.logits, jnp.asarray(x, self.ps.dtype)), axis=-1)

    def kl(self, other):
        return jnp.sum(
            self._bce(other.logits, self.ps) - self._bce(self.logits, self.ps), axis=-1
        )

    def entropy(self):
        return jnp.sum(self._bce(self.logits, self.ps), axis=-1)

    def sample(self, key):
        u = jax.random.uniform(key, self.ps.shape)
        return (u < self.ps).astype(jnp.int32)


class PdType:
    """Knows flat-parameter width and sample shape/dtype for a space
    (distributions.py:34-57)."""

    def __init__(self, space):
        self.space = space
        if isinstance(space, Discrete):
            self.param_size = space.n
            self.sample_shape = ()
            self.sample_dtype = jnp.int32
            self.kind = "categorical"
        elif isinstance(space, MultiDiscrete):
            self.nvec = np.asarray(space.nvec).ravel()
            self.param_size = int(self.nvec.sum())
            self.sample_shape = (len(self.nvec),)
            self.sample_dtype = jnp.int32
            self.kind = "multicategorical"
        elif isinstance(space, Box):
            assert len(space.shape) == 1, "Box actions must be flat vectors"
            self.param_size = 2 * space.shape[0]
            self.sample_shape = space.shape
            self.sample_dtype = jnp.float32
            self.kind = "diag_gaussian"
        elif isinstance(space, MultiBinary):
            self.param_size = space.n
            self.sample_shape = (space.n,)
            self.sample_dtype = jnp.int32
            self.kind = "bernoulli"
        else:
            raise NotImplementedError(f"no distribution for space {space!r}")

    def pdfromflat(self, flat) -> Pd:
        if self.kind == "categorical":
            return CategoricalPd(flat)
        if self.kind == "multicategorical":
            return MultiCategoricalPd(self.nvec, flat)
        if self.kind == "diag_gaussian":
            return DiagGaussianPd(flat)
        if self.kind == "bernoulli":
            return BernoulliPd(flat)
        raise AssertionError(self.kind)


def make_pdtype(space) -> PdType:
    """Space → PdType dispatch (distributions.py:278-290)."""
    return PdType(space)
