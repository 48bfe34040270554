"""Shuffled minibatch iteration over host arrays — capability parity with
baselines/common/dataset.py:1-60 (Dataset epochs, iterbatches).

Design differs from the reference: data is never permuted in place; an
index permutation from a local ``numpy.random.Generator`` is regenerated
per epoch, so the caller's arrays stay untouched and shuffling is
reproducible via the ``rng``/``seed`` argument instead of global numpy
state.
"""

from __future__ import annotations

import numpy as np


class Dataset:
    """Dict-of-arrays minibatch source.

    ``iterate_once(batch_size)`` yields full batches for one epoch;
    ``next_batch(batch_size)`` draws sequentially, reshuffling when the
    epoch is exhausted (reference Dataset contract, common/dataset.py:1-40).
    """

    def __init__(self, data_map, deterministic=False, shuffle=True, seed=None):
        self.data_map = dict(data_map)
        self.deterministic = deterministic
        self.enable_shuffle = shuffle
        sizes = {k: v.shape[0] for k, v in self.data_map.items()}
        assert len(set(sizes.values())) == 1, f"ragged arrays: {sizes}"
        self.n = next(iter(sizes.values()))
        self._rng = np.random.default_rng(seed)
        self._order = np.arange(self.n)
        self._cursor = 0
        if self.enable_shuffle:
            self.shuffle()

    def shuffle(self):
        if not self.deterministic:
            self._order = self._rng.permutation(self.n)
        self._cursor = 0

    def next_batch(self, batch_size):
        if self._cursor >= self.n and self.enable_shuffle:
            self.shuffle()
        take = self._order[self._cursor : self._cursor + batch_size]
        self._cursor += len(take)
        return {k: v[take] for k, v in self.data_map.items()}

    def iterate_once(self, batch_size):
        if self.enable_shuffle:
            self.shuffle()
        while self.n - self._cursor >= batch_size:
            yield self.next_batch(batch_size)
        self._cursor = 0

    def subset(self, num_elements, deterministic=True):
        """First num_elements rows as a new Dataset (dataset.py:33-39)."""
        return Dataset(
            {k: v[:num_elements] for k, v in self.data_map.items()},
            deterministic=deterministic,
        )


def iterbatches(arrays, *, num_batches=None, batch_size=None, shuffle=True,
                include_final_partial_batch=True, rng=None):
    """Yield tuples of aligned minibatches over ``arrays`` (one epoch) —
    common/dataset.py:41-60 contract with an injectable rng."""
    if (num_batches is None) == (batch_size is None):
        raise ValueError("specify exactly one of num_batches / batch_size")
    arrays = tuple(np.asarray(a) for a in arrays)
    n = arrays[0].shape[0]
    assert all(a.shape[0] == n for a in arrays)
    order = (rng or np.random.default_rng()).permutation(n) if shuffle else np.arange(n)
    if batch_size is not None:
        starts = range(0, n, batch_size)
    else:
        edges = np.linspace(0, n, num_batches + 1).astype(int)
        starts, batch_size = edges[:-1], None
        ends = edges[1:]
    for i, s in enumerate(starts):
        e = min(s + batch_size, n) if batch_size is not None else ends[i]
        if batch_size is None or include_final_partial_batch or e - s == batch_size:
            take = order[s:e]
            yield tuple(a[take] for a in arrays)
