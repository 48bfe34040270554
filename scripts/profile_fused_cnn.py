"""A/B the Pallas fused conv-stack kernel vs XLA on the real chip.

Methodology: both programs built in ONE process, timed in interleaved
chunks with hard syncs (float(device_get(scalar)) — block_until_ready lies
on the tunneled axon backend), medians reported.  Workload: the bench
primary's train-phase geometry — s2d-packed u8 obs, minibatch-sized
batches of the Nature-CNN stack (ANALYSIS_r4 §2).

Usage: python scripts/profile_fused_cnn.py [--batch 8192] [--mode fwd|grad]
"""

from __future__ import annotations

import argparse
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


def hard_sync(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def time_chunks(fns, iters, chunks, args_of):
    """Interleave fns in timed chunks; returns {name: median ms/call}."""
    out = {name: [] for name, _ in fns}
    for c in range(chunks):
        for name, fn in fns:
            a = args_of()
            r = fn(*a)
            hard_sync(r)  # warm/steady entry
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(*a)
            hard_sync(r)
            dt = (time.perf_counter() - t0) / iters * 1e3
            out[name].append(dt)
            print(f"  chunk {c} {name}: {dt:.3f} ms", flush=True)
    return {k: statistics.median(v) for k, v in out.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--mode", default="fwd", choices=["fwd", "grad"])
    p.add_argument("--tile", type=int, default=32)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--chunks", type=int, default=7)
    args = p.parse_args()

    from baselines_tpu.ops import fused_cnn as fc

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 256, (args.batch, 21, 21, 64)).astype(np.uint8))

    def pr(*shape, s=0.05):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * s)

    params = (
        pr(2, 2, 64, 32), pr(32), pr(4, 4, 32, 64), pr(64),
        pr(3, 3, 64, 64), pr(64), pr(3136, 512, s=0.01), pr(512),
    )
    params = jax.device_put(params)

    if args.mode == "fwd":
        ref = jax.jit(lambda x, p: fc.reference_forward(x, p))
        fused = jax.jit(lambda x, p: fc.fused_cnn_forward(x, p, tile=args.tile))
        # correctness first
        a = np.asarray(jax.device_get(ref(x[:256], params)))
        b = np.asarray(jax.device_get(fused(x[:256], params)))
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        print(f"on-chip rel err (batch 256): {rel:.2e}", flush=True)
        assert rel < 2e-2, rel
        meds = time_chunks(
            [("xla_fwd", ref), ("pallas_fwd", fused)],
            args.iters, args.chunks, lambda: (x, params),
        )
    else:
        from baselines_tpu.ops.fused_cnn import fused_cnn_apply

        def loss_ref(p, x):
            return jnp.sum(fc.reference_forward(x, p) ** 2) * 1e-6

        def loss_fused(p, x):
            return jnp.sum(fused_cnn_apply(x, p) ** 2) * 1e-6

        ref = jax.jit(jax.grad(loss_ref))
        fused = jax.jit(jax.grad(loss_fused))
        ga = jax.device_get(ref(params, x[:256]))
        gb = jax.device_get(fused(params, x[:256]))
        for i, (u, v) in enumerate(zip(ga, gb)):
            u, v = np.asarray(u), np.asarray(v)
            rel = np.abs(u - v).max() / (np.abs(u).max() + 1e-9)
            print(f"  grad[{i}] rel err {rel:.2e}", flush=True)
            assert rel < 5e-2, (i, rel)
        meds = time_chunks(
            [("xla_grad", lambda p, xx: ref(p, xx)[6]),
             ("pallas_grad", lambda p, xx: fused(p, xx)[6])],
            args.iters, args.chunks, lambda: (params, x),
        )

    print({k: round(v, 3) for k, v in meds.items()})


if __name__ == "__main__":
    main()
