"""Microbenchmark: permuted row-gather of the PPO epoch shuffle (VERDICT r3 #4).

The fused update's third-largest phase is the per-epoch element shuffle of the
uint8 obs batch (ppo2/ppo2.py:160-165 semantics): a (16384, 21*21*64) u8 row
gather, measured in round 3 at ~20% of HBM peak.  This probe measures, on the
real chip:

  copy        — x + 0 streaming copy (the R+W bandwidth floor)
  xla_u8      — x[perm] as emitted today
  xla_u32     — bitcast rows to u32, gather, bitcast back (4x wider elements)
  pallas_dma  — HBM->HBM row DMA kernel with K outstanding copies
                (baselines_tpu/ops/gather.py take_rows)

and prints GB/s (counting read+write of the payload once each).
"""

from __future__ import annotations

import os.path as osp
import statistics
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import os as _os

import jax

if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jax.device_get(out.ravel()[0].astype(jnp.float32)))  # hard sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jax.device_get(out.ravel()[0].astype(jnp.float32)))
        times.append((time.perf_counter() - t0) / iters)
    return statistics.median(times)


def main():
    N, H, W, C = 16384, 21, 21, 64
    R = H * W * C
    nbytes = N * R
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 255, (N, H, W, C), dtype=np.uint8))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))

    def report(tag, dt):
        print(f"{tag:>11}: {dt * 1e3:7.3f} ms  {2 * nbytes / dt / 1e9:7.1f} GB/s")

    copy = jax.jit(lambda x: x + jnp.uint8(1))
    report("copy", timeit(copy, x))

    xla_u8 = jax.jit(lambda x, p: x[p])
    report("xla_u8", timeit(xla_u8, x, perm))

    def u32_gather(x, p):
        xr = jax.lax.bitcast_convert_type(x.reshape(N, R // 4, 4), jnp.uint32)
        g = xr[p]
        return jax.lax.bitcast_convert_type(g, jnp.uint8).reshape(N, H, W, C)

    report("xla_u32", timeit(jax.jit(u32_gather), x, perm))

    # the pallas DMA route is disabled on this image's toolchain
    # (ops/gather.py module docstring records the full bisect); the
    # production path is take_rows_fast, measured as xla_u32 above


if __name__ == "__main__":
    main()
