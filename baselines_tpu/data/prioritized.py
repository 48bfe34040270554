"""Proportional prioritized replay, vectorized for TPU.

The reference implements priorities with a python SumSegmentTree walked
pointer-by-pointer per sampled item (deepq/replay_buffer.py:71-191,
common/segment_tree.py:4-145) — O(log n) serial hops per sample, host-side.
On TPU the idiomatic layout is a dense priority vector: stratified sampling
is one cumsum + a batched searchsorted (both single fused HBM-bandwidth
passes), and priority updates are scatters.  A 1M-slot f32 cumsum is 4 MB of
traffic — microseconds of HBM time — so this beats tree pointer-chasing by
orders of magnitude while sampling the exact same distribution.

Semantics parity (deepq/replay_buffer.py):
- new transitions enter with current max priority (:107-115)
- P(i) ∝ p_i^alpha (:147-152, alpha applied at update time here)
- stratified sampling: one uniform per bucket of the cumulative mass
  (:138-145 sampled `every_range_len` strata)
- IS weights w_i = (N * P(i))^-beta normalized by max weight (:153-176)
- update_priorities with |td|+eps handled by the caller (:178-191)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from baselines_tpu.data.replay import ReplayBuffer, ReplayState


@struct.dataclass
class PrioritizedState:
    buffer: ReplayState
    priorities: jnp.ndarray  # (capacity,) p_i^alpha, 0 where unfilled
    max_priority: jnp.ndarray  # scalar, raw (un-alpha'd) running max


class PrioritizedReplayBuffer:
    def __init__(self, capacity: int, alpha: float = 0.6, use_pallas: bool = False):
        """use_pallas: route index sampling through the two-level Pallas TPU
        kernel (data/pallas_sampler.py) — requires capacity % 16384 == 0;
        ~15% faster than the XLA cumsum path at 1M slots and avoids the
        N-element cumsum temporary."""
        self.buffer = ReplayBuffer(capacity)
        self.capacity = int(capacity)
        self.alpha = float(alpha)
        self.use_pallas = bool(use_pallas)
        if use_pallas:
            from baselines_tpu.data.pallas_sampler import BLOCK, ROWS_PER_TILE

            assert capacity % (BLOCK * ROWS_PER_TILE) == 0, (
                f"pallas sampler needs capacity % {BLOCK * ROWS_PER_TILE} == 0"
            )

    def init(self, sample_item) -> PrioritizedState:
        return PrioritizedState(
            buffer=self.buffer.init(sample_item),
            priorities=jnp.zeros((self.capacity,), jnp.float32),
            max_priority=jnp.ones((), jnp.float32),
        )

    def add_batch(self, state: PrioritizedState, batch) -> PrioritizedState:
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        idx = (state.buffer.ptr + jnp.arange(b, dtype=jnp.int32)) % self.capacity
        new_buffer = self.buffer.add_batch(state.buffer, batch)
        prios = state.priorities.at[idx].set(state.max_priority**self.alpha)
        return PrioritizedState(
            buffer=new_buffer, priorities=prios, max_priority=state.max_priority
        )

    def sample(self, state: PrioritizedState, key, batch_size: int, beta):
        """Returns (batch, idx, is_weights)."""
        u = jax.random.uniform(key, (batch_size,))
        if self.use_pallas:
            from baselines_tpu.data.pallas_sampler import pallas_stratified_sample

            idx = pallas_stratified_sample(state.priorities, u, batch_size)
            total = jnp.sum(state.priorities)
        else:
            cum = jnp.cumsum(state.priorities)
            total = cum[-1]
            # stratified: one uniform per equal slice of the total mass
            targets = (jnp.arange(batch_size) + u) / batch_size * total
            idx = jnp.searchsorted(cum, targets, side="left").astype(jnp.int32)
        idx = jnp.clip(idx, 0, self.capacity - 1)
        batch = jax.tree_util.tree_map(lambda buf: buf[idx], state.buffer.data)
        # importance weights
        n = jnp.maximum(state.buffer.size, 1).astype(jnp.float32)
        probs = state.priorities / jnp.maximum(total, 1e-12)
        min_prob = jnp.min(jnp.where(state.priorities > 0, probs, jnp.inf))
        max_weight = (min_prob * n) ** (-beta)
        weights = (probs[idx] * n) ** (-beta) / jnp.maximum(max_weight, 1e-12)
        return batch, idx, weights.astype(jnp.float32)

    def update_priorities(
        self, state: PrioritizedState, idx, priorities
    ) -> PrioritizedState:
        """priorities are raw (|td|+eps); alpha applied here
        (replay_buffer.py:178-191)."""
        priorities = jnp.asarray(priorities, jnp.float32)
        prios = state.priorities.at[idx].set(priorities**self.alpha)
        return PrioritizedState(
            buffer=state.buffer,
            priorities=prios,
            max_priority=jnp.maximum(state.max_priority, jnp.max(priorities)),
        )

    def can_sample(self, state: PrioritizedState, n: int):
        return state.buffer.size >= n
