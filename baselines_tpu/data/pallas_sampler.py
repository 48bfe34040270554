"""Pallas TPU kernel: two-level stratified sampling from a priority vector.

The XLA path (data/prioritized.py) materializes a full N-element cumsum in
HBM and then runs a batched searchsorted — two full passes over the priority
vector plus an N-element temporary.  This kernel does the classic two-level
decomposition instead:

  pass 1 (grid over blocks): per-block priority sums → (nblocks,) partials
  pass 2 (single program):   tiny exclusive scan of the partials, then for
                             every stratified target: binary-search the
                             block prefix (nblocks ≤ a few thousand —
                             SMEM-friendly), DMA that single block of
                             priorities into VMEM, cumsum it (VPU), and
                             searchsorted within the block.

Total HBM traffic: one read of the priorities + B blocks of BLOCK floats —
~half the XLA path's traffic with no N-sized temporary, and the gather of
sampled priorities falls out for free.  For the 1M-slot buffer of
deepq-on-Atari (deepq/defaults.py buffer_size) this is the hot op of every
training iteration.

Falls back to the XLA implementation off-TPU (tests run the kernel in
interpreter mode for bit-exactness against the fallback).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 2048  # priorities per block; (16, 128) f32 tiles → VMEM-friendly


ROWS_PER_TILE = 8  # f32 sublane tile


def _block_sums_kernel(prios_ref, out_ref):
    # prios_ref: (ROWS_PER_TILE, BLOCK); out_ref: (ROWS_PER_TILE, 128) with
    # the row sum broadcast across lanes (satisfies the (8,128) tile rule)
    sums = jnp.sum(prios_ref[:], axis=1, keepdims=True)
    out_ref[:] = jnp.broadcast_to(sums, out_ref.shape)


def _sample_kernel(targets_ref, block_prefix_ref, prios_hbm, idx_ref, scratch, sem):
    """One program: for each target, locate its block, DMA it in, scan it.
    Block fetches are double-buffered: while target i's block is scanned,
    target i+1's block is already in flight."""
    nblocks = block_prefix_ref.shape[0]
    B = targets_ref.shape[0]

    def find_block(t):
        # binary search the block prefix (block_prefix is inclusive cumsum)
        lo = jnp.int32(0)
        hi = jnp.int32(nblocks - 1)

        def cond(carry):
            lo, hi = carry
            return lo < hi

        def step(carry):
            lo, hi = carry
            mid = (lo + hi) // 2
            go_right = block_prefix_ref[mid] <= t
            return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

        blk, _ = jax.lax.while_loop(cond, step, (lo, hi))
        return blk

    def start_fetch(slot, blk):
        pltpu.make_async_copy(
            prios_hbm.at[blk], scratch.at[slot], sem.at[slot]
        ).start()

    blk0 = find_block(targets_ref[0])
    start_fetch(0, blk0)

    def body(i, blk):
        t = targets_ref[i]
        slot = i % 2
        blk_next = find_block(targets_ref[jnp.minimum(i + 1, B - 1)])

        @pl.when(i + 1 < B)
        def _():
            start_fetch((i + 1) % 2, blk_next)

        base = jnp.where(blk > 0, block_prefix_ref[blk - 1], 0.0)
        pltpu.make_async_copy(
            prios_hbm.at[blk], scratch.at[slot], sem.at[slot]
        ).wait()
        # inclusive prefix sum without a cumsum primitive: triangular
        # matmuls on the MXU.  vals (R=16, L=128); LT[i,j]=1 iff i<=j gives
        # within-row prefixes; UT[i,j]=1 iff i<j gives exclusive row offsets.
        R, L = BLOCK // 128, 128
        vals = scratch[slot]
        li = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        lj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        LT = (li <= lj).astype(jnp.float32)
        ri = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
        UT = (ri < rj).astype(jnp.float32)
        lane_prefix = jnp.dot(vals, LT, preferred_element_type=jnp.float32)
        row_sums = jnp.sum(vals, axis=1)  # (R,)
        row_offsets = jnp.dot(row_sums[None, :], UT, preferred_element_type=jnp.float32)[0]
        incl_prefix = lane_prefix + row_offsets[:, None]
        local = jnp.sum((incl_prefix <= (t - base)).astype(jnp.int32))
        local = jnp.minimum(local, BLOCK - 1)
        idx_ref[i] = blk * BLOCK + local
        return blk_next

    jax.lax.fori_loop(0, B, body, blk0)


@partial(jax.jit, static_argnames=("batch_size", "interpret"))
def pallas_stratified_sample(priorities, uniforms, batch_size: int, interpret: bool = False):
    """Sample `batch_size` indices ∝ priorities with stratified targets.

    priorities: (N,) f32, N a multiple of BLOCK (pad with zeros).
    uniforms:   (batch_size,) in [0, 1).
    Returns idx (batch_size,) int32.
    """
    n = priorities.shape[0]
    assert n % BLOCK == 0, f"pad priorities to a multiple of {BLOCK}"
    nblocks = n // BLOCK

    assert nblocks % ROWS_PER_TILE == 0, (
        f"pad priorities to a multiple of {ROWS_PER_TILE * BLOCK}"
    )
    block_sums = pl.pallas_call(
        _block_sums_kernel,
        grid=(nblocks // ROWS_PER_TILE,),
        in_specs=[
            pl.BlockSpec(
                (ROWS_PER_TILE, BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (ROWS_PER_TILE, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks, 128), jnp.float32),
        interpret=interpret,
    )(priorities.reshape(nblocks, BLOCK))[:, 0]

    block_prefix = jnp.cumsum(block_sums)  # tiny (nblocks,)
    total = block_prefix[-1]
    targets = (jnp.arange(batch_size, dtype=jnp.float32) + uniforms) / batch_size * total

    idx = pl.pallas_call(
        _sample_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # targets (scalar reads)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # block prefix (scalar reads)
            pl.BlockSpec(memory_space=pltpu.ANY),  # priorities stay in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((batch_size,), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK // 128, 128), jnp.float32),  # double-buffered
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(targets, block_prefix, priorities.reshape(nblocks, BLOCK // 128, 128))
    return idx
