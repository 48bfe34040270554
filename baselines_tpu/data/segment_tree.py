"""Array-backed segment trees as device state — parity with
baselines/common/segment_tree.py:4-145 (SumSegmentTree / MinSegmentTree:
power-of-two array tree, O(log n) point set + range reduce,
find_prefixsum_idx descent).

The reference walks the tree with python recursion per item; here every
operation is a vectorized level-by-level sweep over device arrays, so a
BATCH of point updates or prefix-sum descents is one fused computation.
(The prioritized replay buffer uses the dense-vector formulation in
data/prioritized.py — better on TPU — but the tree is provided as a
first-class component for parity and for workloads needing range-min.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SegmentTreeState:
    tree: jnp.ndarray  # (2*capacity,), leaves at [capacity, 2*capacity)


class SegmentTree:
    def __init__(self, capacity: int, operation: str):
        assert capacity > 0 and capacity & (capacity - 1) == 0, (
            "capacity must be positive and a power of 2"
        )
        assert operation in ("sum", "min")
        self.capacity = capacity
        self.operation = operation
        self._op = jnp.add if operation == "sum" else jnp.minimum
        self._neutral = 0.0 if operation == "sum" else jnp.inf
        self.levels = capacity.bit_length()  # log2(capacity)+1

    def init(self) -> SegmentTreeState:
        return SegmentTreeState(
            tree=jnp.full((2 * self.capacity,), self._neutral, jnp.float32)
        )

    def set(self, state: SegmentTreeState, idx, vals) -> SegmentTreeState:
        """Batched __setitem__ (segment_tree.py:63-77): set leaves, then
        rebuild each level bottom-up (one vectorized pass per level)."""
        idx = jnp.asarray(idx, jnp.int32)
        tree = state.tree.at[idx + self.capacity].set(jnp.asarray(vals, jnp.float32))

        # rebuild ancestors level by level; each level halves the node count
        def fix_level(tree, level_size):
            nodes = jnp.arange(level_size, 2 * level_size)
            left = tree[2 * nodes]
            right = tree[2 * nodes + 1]
            return tree.at[nodes].set(self._op(left, right))

        size = self.capacity // 2
        while size >= 1:
            tree = fix_level(tree, size)
            size //= 2
        return SegmentTreeState(tree=tree)

    def get(self, state: SegmentTreeState, idx):
        return state.tree[jnp.asarray(idx, jnp.int32) + self.capacity]

    def reduce_all(self, state: SegmentTreeState):
        return state.tree[1]

    def reduce(self, state: SegmentTreeState, start: int, end: int):
        """Range reduce over [start, end) — static bounds (host-side helper,
        segment_tree.py:37-61)."""
        leaves = state.tree[self.capacity + start : self.capacity + end]
        return jnp.sum(leaves) if self.operation == "sum" else jnp.min(leaves)


class SumSegmentTree(SegmentTree):
    def __init__(self, capacity: int):
        super().__init__(capacity, "sum")

    def find_prefixsum_idx(self, state: SegmentTreeState, prefixsum):
        """Batched descent (segment_tree.py:97-123): largest idx with
        sum(leaves[:idx]) <= prefixsum.  Vectorized over a batch of queries,
        log2(capacity) steps."""
        prefixsum = jnp.asarray(prefixsum, jnp.float32)

        def step(carry, _):
            node, remaining = carry
            left = 2 * node
            left_val = state.tree[left]
            # reference descent (segment_tree.py:106-115): go left only when
            # the left subtree STRICTLY exceeds the remaining mass
            go_right = left_val <= remaining
            node = jnp.where(go_right, left + 1, left)
            remaining = jnp.where(go_right, remaining - left_val, remaining)
            return (node, remaining), None

        node0 = jnp.ones_like(prefixsum, dtype=jnp.int32)
        (node, _), _ = jax.lax.scan(
            step, (node0, prefixsum), None, length=self.levels - 1
        )
        return node - self.capacity


class MinSegmentTree(SegmentTree):
    def __init__(self, capacity: int):
        super().__init__(capacity, "min")
