"""RNG key plumbing.

The reference seeds per-MPI-rank with ``seed + 10000*rank``
(baselines/common/cmd_util.py:36-37) and python/np/tf global seeds
(common/misc_util.py set_global_seeds).  Here all randomness flows through
explicit jax PRNG keys carried in train state; per-shard divergence comes
from folding in the data-shard index, which is deterministic and
reproducible regardless of host count.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_key(seed: int | None) -> jax.Array:
    """Also seeds python/np host RNGs for any host-side sampling
    (misc_util.set_global_seeds parity)."""
    if seed is None:
        seed = random.SystemRandom().randint(0, 2**31 - 1)
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)


def fold_shard(key: jax.Array, shard_index) -> jax.Array:
    """Deterministic per-shard stream (replaces seed+10000*rank,
    cmd_util.py:36-37)."""
    return jax.random.fold_in(key, shard_index)


def split_tree(key: jax.Array, n: int):
    return list(jax.random.split(key, n))
