"""Episode-major replay buffer with hindsight goal relabeling.

Parity: her/replay_buffer.py:6-108 (episode-major storage {o: (C,T+1,do),
ag: (C,T+1,dg), g: (C,T,dg), u: (C,T,du)}, overwrite-random-when-full) and
her/her_sampler.py:4-63 ('future' strategy: with probability
1-1/(1+replay_k) replace the goal with an achieved goal from a uniformly
chosen FUTURE step of the same episode, then recompute the reward).

TPU-native: the reference relabels per-sample in numpy on the host under a
lock; here storage is an HBM pytree and sampling+relabeling is a fused
gather + where + reward kernel inside the jitted train step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class HerBufferState:
    o: jnp.ndarray  # (C, T+1, do)
    ag: jnp.ndarray  # (C, T+1, dg)
    g: jnp.ndarray  # (C, T, dg)
    u: jnp.ndarray  # (C, T, du)
    n_episodes: jnp.ndarray  # total ever stored (int32)


class HerReplayBuffer:
    def __init__(self, capacity_episodes: int, T: int, dims: dict):
        """dims: {'o': do, 'g': dg, 'u': du}."""
        self.C = int(capacity_episodes)
        self.T = int(T)
        self.dims = dims

    def init(self) -> HerBufferState:
        C, T = self.C, self.T
        return HerBufferState(
            o=jnp.zeros((C, T + 1, self.dims["o"]), jnp.float32),
            ag=jnp.zeros((C, T + 1, self.dims["g"]), jnp.float32),
            g=jnp.zeros((C, T, self.dims["g"]), jnp.float32),
            u=jnp.zeros((C, T, self.dims["u"]), jnp.float32),
            n_episodes=jnp.zeros((), jnp.int32),
        )

    def store_episodes(self, state: HerBufferState, key, o, ag, g, u) -> HerBufferState:
        """Store B episodes: o/ag (B,T+1,·), g/u (B,T,·).  Sequential slots
        while not full, then overwrite random slots
        (her/replay_buffer.py:60-84 _get_storage_idx)."""
        B = o.shape[0]
        seq_idx = (state.n_episodes + jnp.arange(B, dtype=jnp.int32)) % self.C
        rand_idx = jax.random.randint(key, (B,), 0, self.C, jnp.int32)
        idx = jnp.where(state.n_episodes + jnp.arange(B) < self.C, seq_idx, rand_idx)
        return HerBufferState(
            o=state.o.at[idx].set(o),
            ag=state.ag.at[idx].set(ag),
            g=state.g.at[idx].set(g),
            u=state.u.at[idx].set(u),
            n_episodes=state.n_episodes + B,
        )

    def sample(
        self,
        state: HerBufferState,
        key,
        batch_size: int,
        replay_k: float,
        compute_reward: Callable,
    ):
        """Returns dict(o, o2, g, u, r) with 'future' hindsight relabeling
        (her_sampler.py:14-61)."""
        n_valid = jnp.clip(state.n_episodes, 1, self.C)
        kep, kt, kher, kfut = jax.random.split(key, 4)
        ep = jax.random.randint(kep, (batch_size,), 0, n_valid, jnp.int32)
        t = jax.random.randint(kt, (batch_size,), 0, self.T, jnp.int32)

        future_p = 1.0 - 1.0 / (1.0 + replay_k)
        her_mask = jax.random.uniform(kher, (batch_size,)) < future_p
        # future_t uniform in (t, T]  (her_sampler.py:38-41)
        offset = jax.random.uniform(kfut, (batch_size,)) * (self.T - t)
        future_t = t + 1 + offset.astype(jnp.int32)
        future_t = jnp.clip(future_t, 0, self.T)

        g_orig = state.g[ep, t]
        g_future = state.ag[ep, future_t]
        g_used = jnp.where(her_mask[:, None], g_future, g_orig)

        o = state.o[ep, t]
        o2 = state.o[ep, t + 1]
        ag2 = state.ag[ep, t + 1]
        u = state.u[ep, t]
        r = compute_reward(ag2, g_used)
        return {"o": o, "o2": o2, "g": g_used, "u": u, "r": r, "ag2": ag2}
