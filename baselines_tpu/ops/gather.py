"""Permuted row gather for the epoch shuffle (ppo2/ppo2.py:160-165 analog).

Production path: ``take_rows_fast`` — XLA gather through the widest element
view available (measured fastest formulation on this chip).

The Pallas route (``take_rows``) was fully explored on-chip in round 4 and
is NOT the production path; findings, so the next round doesn't re-walk
this (all measured 2026-08-21, scripts/profile_gather.py + ad-hoc bisects):

- The speed-of-light design — one HBM->HBM DMA per row with a ring of K
  outstanding copies — CRASHES this image's chipless AOT compiler
  (remote_compile HTTP 500) for ANY sliced-destination HBM DMA: static or
  dynamic index, rank-reducing ``.at[i]`` or rank-preserving ``pl.ds``,
  u8 or f32, aligned or not.  Whole-ref HBM->HBM DMA compiles fine, and
  HBM->VMEM sliced-source DMA compiles fine (data/pallas_sampler.py uses
  it in production), so the trigger is specifically sliced HBM
  destinations.
- The canonical scalar-prefetch ``index_map`` formulation (the pipeline
  issues one (1, R/128, 128) block DMA per grid step) compiles and runs
  correctly at 100.8 GB/s — but XLA's own gather does 124 GB/s on the
  same rows, so the kernel loses to per-grid-step overhead at 16K steps
  and cannot batch scattered sources into bigger blocks.

``take_rows`` therefore keeps the ring-DMA kernel for interpreter-mode
correctness (tests/test_pallas_sampler.py pattern) and falls back to XLA
everywhere it matters.
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
    # compiled TPU execution is DISABLED: sliced-HBM-destination DMA crashes
    # this image's AOT compiler (module docstring) — the kernel exists for
    # interpreter-mode correctness and for toolchains where it compiles
    if not interpret or n < K_INFLIGHT or row_bytes < 4096:
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
