"""Segment tree tests — transcription of the reference's
common/tests/test_segment_tree.py cases onto the device implementation."""

import jax.numpy as jnp
import numpy as np

from baselines_tpu.data.segment_tree import MinSegmentTree, SumSegmentTree


def test_tree_set():
    tree = SumSegmentTree(4)
    s = tree.init()
    s = tree.set(s, jnp.asarray([2, 3]), jnp.asarray([1.0, 3.0]))
    assert np.isclose(float(tree.reduce_all(s)), 4.0)
    assert np.isclose(float(tree.reduce(s, 0, 2)), 0.0)
    assert np.isclose(float(tree.reduce(s, 2, 3)), 1.0)
    assert np.isclose(float(tree.reduce(s, 2, 4)), 4.0)


def test_tree_set_overlap():
    tree = SumSegmentTree(4)
    s = tree.init()
    s = tree.set(s, jnp.asarray([2]), jnp.asarray([1.0]))
    s = tree.set(s, jnp.asarray([2]), jnp.asarray([3.0]))
    assert np.isclose(float(tree.reduce_all(s)), 3.0)
    assert np.isclose(float(tree.reduce(s, 2, 4)), 3.0)


def test_prefixsum_idx():
    tree = SumSegmentTree(4)
    s = tree.init()
    s = tree.set(s, jnp.asarray([2, 3]), jnp.asarray([1.0, 3.0]))
    queries = jnp.asarray([0.0, 0.5, 0.99, 1.01, 3.0, 4.0])
    got = np.asarray(tree.find_prefixsum_idx(s, queries))
    assert list(got) == [2, 2, 2, 3, 3, 3]


def test_prefixsum_idx2():
    tree = SumSegmentTree(4)
    s = tree.init()
    s = tree.set(s, jnp.asarray([0, 1, 2, 3]), jnp.asarray([0.5, 1.0, 1.0, 3.0]))
    queries = jnp.asarray([0.0, 0.55, 0.99, 1.51, 3.0, 5.5])
    got = np.asarray(tree.find_prefixsum_idx(s, queries))
    assert list(got) == [0, 1, 1, 2, 3, 3]


def test_max_interval_tree():
    tree = MinSegmentTree(4)
    s = tree.init()
    s = tree.set(s, jnp.asarray([0, 2, 3]), jnp.asarray([1.0, 0.5, 3.0]))
    assert np.isclose(float(tree.reduce_all(s)), 0.5)
    assert np.isclose(float(tree.reduce(s, 0, 2)), 1.0)
    assert np.isclose(float(tree.reduce(s, 2, 4)), 0.5)
    assert np.isclose(float(tree.reduce(s, 2, 3)), 0.5)
    s = tree.set(s, jnp.asarray([2]), jnp.asarray([0.7]))
    assert np.isclose(float(tree.reduce_all(s)), 0.7)
