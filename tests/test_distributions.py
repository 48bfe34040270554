"""Monte-Carlo self-consistency of distributions — the validate_probtype
trick from the reference (common/distributions.py:299-348): estimated
E[-logp] must match analytic entropy and estimated E[logp - logq] must match
analytic KL within 3 standard errors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baselines_tpu.envs.spaces import Box, Discrete, MultiBinary, MultiDiscrete
from baselines_tpu.nn.distributions import make_pdtype

N = 20000


def _check(space, flat1, flat2):
    pdtype = make_pdtype(space)
    pd1 = pdtype.pdfromflat(jnp.broadcast_to(jnp.asarray(flat1, jnp.float32), (N, len(flat1))))
    pd2 = pdtype.pdfromflat(jnp.broadcast_to(jnp.asarray(flat2, jnp.float32), (N, len(flat2))))
    key = jax.random.PRNGKey(0)
    xs = pd1.sample(key)

    # entropy: E[-log p(x)] ≈ H
    logps = np.asarray(pd1.logp(xs))
    ent_est, ent_std = logps.mean(), logps.std() / np.sqrt(N)
    ent = float(np.asarray(pd1.entropy())[0])
    assert abs(-ent_est - ent) < 3 * ent_std + 1e-4, (space, -ent_est, ent)

    # KL: E[log p(x) - log q(x)] ≈ KL(p||q)
    logqs = np.asarray(pd2.logp(xs))
    kl_est = (logps - logqs).mean()
    kl_std = (logps - logqs).std() / np.sqrt(N)
    kl = float(np.asarray(pd1.kl(pd2))[0])
    assert abs(kl_est - kl) < 3 * kl_std + 1e-4, (space, kl_est, kl)

    # KL(p||p) == 0
    assert abs(float(np.asarray(pd1.kl(pd1))[0])) < 1e-5


def test_categorical():
    _check(Discrete(4), [0.2, 0.3, 0.5, 0.1], [0.1, -0.1, 0.6, 0.2])


def test_multicategorical():
    _check(MultiDiscrete([3, 2]), [0.2, 0.3, 0.5, -0.1, 0.6], [0.3, 0.1, 0.2, 0.2, 0.4])


def test_diag_gaussian():
    _check(Box(-np.inf, np.inf, (3,)), [0.5, -0.2, 0.1, -0.1, 0.3, 0.2], [0.1, 0.0, 0.2, 0.1, 0.1, 0.3])


def test_bernoulli():
    _check(MultiBinary(3), [0.5, -0.2, 0.9], [0.1, -0.4, 0.3])


def test_categorical_sample_distribution():
    """Gumbel sampling matches softmax probabilities."""
    logits = jnp.asarray([[1.0, 2.0, 0.5]])
    pd = make_pdtype(Discrete(3)).pdfromflat(jnp.broadcast_to(logits, (50000, 3)))
    xs = np.asarray(pd.sample(jax.random.PRNGKey(1)))
    emp = np.bincount(xs, minlength=3) / len(xs)
    expected = np.asarray(jax.nn.softmax(logits[0]))
    assert np.allclose(emp, expected, atol=0.01)


def test_neglogp_matches_scipy():
    from scipy import stats

    flat = jnp.asarray([[0.3, -0.2, 0.1, 0.4]])  # mean (2,), logstd (2,)
    pd = make_pdtype(Box(-np.inf, np.inf, (2,))).pdfromflat(flat)
    x = jnp.asarray([[0.5, 0.1]])
    got = float(pd.neglogp(x)[0])
    expected = -stats.multivariate_normal.logpdf(
        np.asarray(x[0]),
        mean=np.asarray([0.3, -0.2]),
        cov=np.diag(np.exp(2 * np.asarray([0.1, 0.4]))),
    )
    assert np.isclose(got, expected, atol=1e-5)
