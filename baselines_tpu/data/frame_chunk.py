"""Frame-deduplicated trajectory-chunk storage — the role of the reference's
ACER buffer (acer/buffer.py:3-156), which keeps raw UNstacked frames and
re-stacks on read so a k-frame-stacked Atari replay costs 1× frame memory
instead of k×.

Here the codec is a pair of pure jittable functions over a rollout chunk of
frame-stacked observations (VecFrameStack layout: last axis = k frames × C
channels, oldest→newest, stack zeroed on episode reset —
vec_frame_stack.py:6-30 semantics):

    compress_frames:  obs (T+1, ..., k·C), dones (T,)  →  first (..., k·C),
                      frames (T, ..., C)
    decompress_frames: inverse, reconstructing every stacked obs including
                      the zeroing of pre-reset frames across episode
                      boundaries (done[t] ⇒ obs[t+1] starts a fresh stack).

Storing (first, frames) in the replay ring instead of full stacks is a
~k× memory saving for T ≫ k.  Reconstruction is one gather + mask —
HBM-bandwidth-bound, fused by XLA into the consuming computation.
"""

from __future__ import annotations

import jax.numpy as jnp


def compress_frames(obs: jnp.ndarray, dones: jnp.ndarray, k: int):
    """obs (T+1, ..., k·C) frame-stacked rollout chunk → (first, frames).

    first: obs[0] in full (its older frames may already be zeros from a
    reset — kept verbatim).  frames[t]: the newest C channels of obs[t+1].
    """
    kc = obs.shape[-1]
    assert kc % k == 0, f"last axis {kc} not divisible by stack depth {k}"
    c = kc // k
    return obs[0], obs[1:, ..., -c:]


def decompress_frames(
    first: jnp.ndarray, frames: jnp.ndarray, dones: jnp.ndarray, k: int
) -> jnp.ndarray:
    """Rebuild the (T+1, ..., k·C) stacked chunk from compress_frames output.

    dones (T,): done[t] marks the transition obs[t] → obs[t+1] as an episode
    boundary (obs[t+1] is the auto-reset observation, so every frame produced
    at step ≤ t must be zero inside obs[t'≥t+1]'s stack).
    """
    t_len = frames.shape[0]
    c = frames.shape[-1]
    # frame timeline F: k initial frames (from `first`) + T rollout frames
    init = jnp.moveaxis(
        first.reshape(first.shape[:-1] + (k, c)), -2, 0
    )  # (k, ..., C) oldest→newest
    f = jnp.concatenate([init, frames], axis=0)  # (k+T, ..., C)

    # episode index of each timestep t (0..T) and of each frame
    epi = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(dones.astype(jnp.int32))]
    )  # (T+1,)
    # frame j was produced at step s = j-(k-1); initial frames act as step 0
    frame_step = jnp.clip(jnp.arange(k + t_len) - (k - 1), 0, t_len)
    frame_epi = epi[frame_step]  # (k+T,)

    # stacked obs[t] = frames t..t+k-1 on the channel axis, masked to epi
    # match.  Formulated as k SHIFTED SLICES + one channel concat: the
    # round-4 window-gather version (f[idx] over a (T+1, k) index grid,
    # then a moveaxis interleave) cost ~160 ms per 64-chunk acer replay
    # sample on a v5e — the u8 gather + transpose dominated the whole
    # replay update (results/perf/ANALYSIS_r5.md §7); plain slices are
    # layout-preserving and lower to copies at memory speed.
    parts = []
    for j in range(k):  # channel group j holds frame t+j (oldest→newest)
        part = f[j : j + t_len + 1]                  # (T+1, ..., C)
        alive = frame_epi[j : j + t_len + 1] == epi  # (T+1,)
        alive = alive.reshape((t_len + 1,) + (1,) * (part.ndim - 1))
        parts.append(jnp.where(alive, part, jnp.zeros_like(part)))
    return jnp.concatenate(parts, axis=-1).astype(first.dtype)
