"""Math utility tests (reference in-file tests: common/math_util.py:75-85)."""

import jax.numpy as jnp
import numpy as np

from baselines_tpu.core.math import (
    discount,
    explained_variance,
    flatten_tree,
    global_norm,
    huber_loss,
    unflatten_like,
)


def test_discount():
    gamma = 0.9
    x = np.random.RandomState(0).randn(10, 3).astype(np.float32)
    expected = np.zeros_like(x)
    acc = np.zeros(3, np.float32)
    for t in reversed(range(10)):
        acc = x[t] + gamma * acc
        expected[t] = acc
    got = np.asarray(discount(jnp.asarray(x), gamma))
    assert np.allclose(got, expected, atol=1e-5)


def test_explained_variance():
    rng = np.random.RandomState(1)
    y = rng.randn(100)
    assert np.isclose(float(explained_variance(jnp.asarray(y), jnp.asarray(y))), 1.0)
    noise = y + 0.1 * rng.randn(100)
    ev = float(explained_variance(jnp.asarray(noise), jnp.asarray(y)))
    assert 0.9 < ev <= 1.0
    assert np.isnan(float(explained_variance(jnp.asarray(y), jnp.zeros(100))))


def test_huber():
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    got = np.asarray(huber_loss(x))
    expected = np.asarray([1.5, 0.125, 0.0, 0.125, 1.5])
    assert np.allclose(got, expected)


def test_flatten_roundtrip():
    tree = {"a": jnp.ones((2, 3)), "b": {"c": jnp.arange(4.0)}}
    flat = flatten_tree(tree)
    assert flat.shape == (10,)
    back = unflatten_like(flat, tree)
    assert np.allclose(np.asarray(back["b"]["c"]), np.arange(4.0))
    assert float(global_norm(tree)) > 0
