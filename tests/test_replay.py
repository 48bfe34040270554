"""Replay buffer tests (reference: test_segment_tree.py semantics via the
prioritized sampler, plus ring-buffer behavior of deepq/replay_buffer.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from baselines_tpu.data.prioritized import PrioritizedReplayBuffer
from baselines_tpu.data.replay import ReplayBuffer


def _item():
    return {"obs": jnp.zeros((3,)), "act": jnp.zeros((), jnp.int32), "rew": jnp.zeros(())}


def test_ring_wraparound(key):
    rb = ReplayBuffer(8)
    state = rb.init(_item())
    for i in range(3):  # write 3 batches of 5 => 15 > capacity 8
        batch = {
            "obs": jnp.full((5, 3), i, jnp.float32),
            "act": jnp.full((5,), i, jnp.int32),
            "rew": jnp.arange(5, dtype=jnp.float32) + 10 * i,
        }
        state = rb.add_batch(state, batch)
    assert int(state.size) == 8
    assert int(state.ptr) == 15 % 8
    # newest data present, oldest overwritten
    acts = np.asarray(state.data["act"])
    assert set(acts.tolist()) <= {1, 2}
    batch, idx = rb.sample(state, key, 32)
    assert batch["obs"].shape == (32, 3)


def test_prioritized_sampling_proportional(key):
    cap = 64
    prb = PrioritizedReplayBuffer(cap, alpha=1.0)
    state = prb.init(_item())
    batch = {
        "obs": jnp.zeros((cap, 3)),
        "act": jnp.arange(cap, dtype=jnp.int32),
        "rew": jnp.zeros((cap,)),
    }
    state = prb.add_batch(state, batch)
    # set priorities: item 7 has 10x the mass of the others
    prios = np.ones(cap, np.float32)
    prios[7] = 10.0 * (cap - 1)
    state = prb.update_priorities(state, jnp.arange(cap), jnp.asarray(prios))
    counts = np.zeros(cap)
    for i in range(50):
        _, idx, w = prb.sample(state, jax.random.fold_in(key, i), 128, beta=0.4)
        counts += np.bincount(np.asarray(idx), minlength=cap)
    frac7 = counts[7] / counts.sum()
    # expected mass: 10(cap-1) / (10(cap-1) + cap-1) = 10/11
    assert abs(frac7 - 10 / 11) < 0.03
    # IS weights: rare items get weight 1 (max), frequent item less
    _, idx, w = prb.sample(state, key, 256, beta=1.0)
    w = np.asarray(w)
    idx = np.asarray(idx)
    assert np.all(w[idx == 7] < w[idx != 7].min() + 1e-6)
    assert np.isclose(w[idx != 7].max(), 1.0, atol=1e-5)


def test_new_items_get_max_priority(key):
    prb = PrioritizedReplayBuffer(16, alpha=1.0)
    state = prb.init(_item())
    b1 = {"obs": jnp.zeros((4, 3)), "act": jnp.zeros((4,), jnp.int32), "rew": jnp.zeros((4,))}
    state = prb.add_batch(state, b1)
    state = prb.update_priorities(state, jnp.arange(4), jnp.full((4,), 5.0))
    assert float(state.max_priority) == 5.0
    state = prb.add_batch(state, b1)  # slots 4..7 get max priority 5
    assert np.allclose(np.asarray(state.priorities[4:8]), 5.0)
