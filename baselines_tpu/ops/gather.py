"""Pallas TPU kernel: permuted row gather at HBM streaming bandwidth.

`out[i] = x[idx[i]]` for large fixed-size rows — the hot op of ppo2's
per-epoch minibatch shuffle (ppo2/ppo2.py:160-165: `np.random.shuffle(inds)`
then fancy-indexing the flattened rollout).  XLA lowers the uint8 obs-batch
gather to an element-granularity loop that round-3 profiling measured at
~20% of v5e HBM peak (results/perf/ANALYSIS_r3.md §5).  The rows are 28 KB
contiguous byte ranges, so the speed-of-light implementation is pure data
movement: one DMA per row, HBM -> HBM, with a ring of K outstanding copies
so the DMA engine always has work in flight.  No VMEM round-trip, no tiling
constraint (DMA is byte-oriented; only compute blocks care about (32,128)
u8 tiles — and this kernel computes nothing).

The row indices ride in as a scalar-prefetch operand (SMEM), read one
scalar per iteration to program the next DMA's source slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_INFLIGHT = 8  # outstanding row DMAs; each row is ~28 KB for the bench obs


def take_rows_fast(x: jax.Array, idx: jax.Array) -> jax.Array:
    """`x[idx]` with the widest element view available.

    XLA's permuted row-gather throughput scales with element width on TPU
    (measured on a v5e, 28 KB rows: u8 87 GB/s, u32 126 GB/s vs 216 GB/s
    streaming copy — scripts/profile_gather.py), so CONTIGUOUS uint8 rows
    (ndim == 2) whose byte count is a multiple of 4 are gathered through a
    bitcast u32 view.  Higher-rank uint8 rows are left alone: their HBM
    layout is tile-padded, so the reshape feeding the bitcast materializes
    a full relayout copy that costs far more than the gather saves
    (measured +70 ms on the fused PPO update).  Pure jnp — safe under
    vmap/jit/GSPMD."""
    if x.ndim == 2 and x.dtype == jnp.uint8:
        row = int(x.shape[1])
        if row % 4 == 0 and row >= 1024:
            xr = jax.lax.bitcast_convert_type(
                x.reshape(x.shape[:1] + (row // 4, 4)), jnp.uint32
            )
            g = xr[idx]
            return jax.lax.bitcast_convert_type(g, jnp.uint8).reshape(
                (idx.shape[0],) + x.shape[1:]
            )
    return x[idx]


def _gather_rows_kernel(idx_ref, x_hbm, out_hbm, sem):
    n = out_hbm.shape[0]

    def row_copy(j, slot):
        return pltpu.make_async_copy(
            x_hbm.at[idx_ref[j]], out_hbm.at[j], sem.at[slot]
        )

    def body(j, _):
        slot = jax.lax.rem(j, K_INFLIGHT)

        @pl.when(j >= K_INFLIGHT)
        def _():
            # drain the copy that used this slot K iterations ago (all
            # copies are shape-equal, so any same-shaped descriptor waits
            # the right byte count)
            row_copy(j - K_INFLIGHT, slot).wait()

        row_copy(j, slot).start()
        return 0

    jax.lax.fori_loop(0, n, body, 0)
    for k in range(K_INFLIGHT):
        # drain the tail (n >= K_INFLIGHT is asserted in the wrapper)
        row_copy(n - K_INFLIGHT + k, jax.lax.rem(n - K_INFLIGHT + k, K_INFLIGHT)).wait()


@partial(jax.jit, static_argnames=("interpret",))
def take_rows(x: jax.Array, idx: jax.Array, *, interpret: bool = False) -> jax.Array:
    """out[i] = x[idx[i]] — row gather as a streaming DMA kernel.

    x: (N, ...) with fixed-shape rows; idx: (M,) int32.  Falls back to
    XLA's gather off-TPU (and for rows too small to amortize a DMA each).
    """
    assert idx.ndim == 1, idx.shape
    n = int(idx.shape[0])
    row_bytes = int(np.prod(x.shape[1:])) * x.dtype.itemsize
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or interpret) or n < K_INFLIGHT or row_bytes < 4096:
        return x[idx]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((K_INFLIGHT,))],
    )
    return pl.pallas_call(
        _gather_rows_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n,) + x.shape[1:], x.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx.astype(jnp.int32), x)
