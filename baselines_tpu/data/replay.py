"""HBM-resident uniform replay buffer.

The reference's ReplayBuffer is a python list of tuples appended one
transition at a time with per-item numpy encoding on sample
(deepq/replay_buffer.py:7-68).  Here the buffer is a pytree of fixed-shape
device arrays (capacity-major), writes are batched circular scatters, and
sampling is a vectorized gather — everything stays in HBM and fuses into the
jitted train iteration; observations stay uint8 until the network's /255.

Works for any transition pytree (dict of arrays), so it also backs the DDPG
memory (ddpg/memory.py:42-83) with its five parallel rings.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayState:
    data: Any  # pytree, leaves (capacity, ...)
    ptr: jnp.ndarray  # int32 next write slot
    size: jnp.ndarray  # int32 current fill


class ReplayBuffer:
    def __init__(self, capacity: int):
        self.capacity = int(capacity)

    def init(self, sample_item) -> ReplayState:
        """sample_item: pytree of arrays shaped like ONE transition (no batch
        dim); storage dtypes are taken from it."""
        data = jax.tree_util.tree_map(
            lambda x: jnp.zeros((self.capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
            sample_item,
        )
        return ReplayState(
            data=data, ptr=jnp.zeros((), jnp.int32), size=jnp.zeros((), jnp.int32)
        )

    def add_batch(self, state: ReplayState, batch) -> ReplayState:
        """Append B transitions (leading batch dim) at the circular cursor."""
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        idx = (state.ptr + jnp.arange(b, dtype=jnp.int32)) % self.capacity
        data = jax.tree_util.tree_map(
            lambda buf, x: buf.at[idx].set(x.astype(buf.dtype)), state.data, batch
        )
        return ReplayState(
            data=data,
            ptr=(state.ptr + b) % self.capacity,
            size=jnp.minimum(state.size + b, self.capacity),
        )

    def sample(self, state: ReplayState, key, batch_size: int):
        """Uniform with replacement over the filled region
        (replay_buffer.py:57-68 samples with replacement too)."""
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(state.size, 1))
        return jax.tree_util.tree_map(lambda buf: buf[idx], state.data), idx

    def can_sample(self, state: ReplayState, n: int):
        return state.size >= n
