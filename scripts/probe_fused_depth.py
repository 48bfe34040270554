"""Locate the cost inside the fused CNN kernel: time partial-depth variants.

d0: load x + u8->bf16 conversion only
d1: + conv1 (4 sliced-operand tap matmuls)
d2: + conv2 (phase split + 16 tap matmuls)
d3: + conv3 (9 tap matmuls)
d4: full (+ fc 49 position matmuls)        == production forward

Each variant funnels its last activation through a cheap ones-matmul into
the (B,512) output so no work can be dead-code-eliminated.
"""

import os.path as osp
import statistics
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from baselines_tpu.ops import fused_cnn as fc


def make_kernel(depth):
    def kernel(x_ref, w1, b1, w2, b2, w3, b3, wfc, bfc, ones_ref, out_ref):
        xr = x_ref[0] if x_ref.shape[0] == 1 and len(x_ref.shape) == 5 else x_ref[:]
        if depth == -1:  # dA: block DMA only — touch one spatial position
            s = xr[0, 0].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            out_ref[:] = jax.lax.dot_general(
                s, ones_ref[: s.shape[1]], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return
        if xr.dtype == jnp.bfloat16:  # dB: pre-converted input
            x = xr
        else:
            x = xr.astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
        x = x.astype(jnp.bfloat16)
        h = x
        if depth >= 1:
            z1 = fc._conv_taps(h, w1, 2, 2, fc.H1, fc.W1) + b1[:]
            h = jnp.maximum(z1, 0.0).astype(jnp.bfloat16)
        if depth >= 2:
            z2 = fc._conv_taps_s2(h, w2, 4, 4, fc.H2, fc.W2) + b2[:]
            h = jnp.maximum(z2, 0.0).astype(jnp.bfloat16)
        if depth >= 3:
            z3 = fc._conv_taps(h, w3, 3, 3, fc.H3, fc.W3) + b3[:]
            h = jnp.maximum(z3, 0.0).astype(jnp.bfloat16)
        if depth >= 4:
            z4 = None
            for y in range(fc.H3):
                for xp in range(fc.W3):
                    z4 = fc._tap_matmul_2d(h[y, xp], wfc[y * fc.W3 + xp], z4)
            out_ref[:] = jnp.maximum(z4 + bfc[:], 0.0)
            return
        s = jnp.sum(h.astype(jnp.float32), axis=(0, 1))  # (B, C)
        out_ref[:] = jax.lax.dot_general(
            s, ones_ref[: s.shape[1]], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


def build(depth, batch, tile, tiled_layout=False):
    xspec = (
        pl.BlockSpec((1, fc.H0, fc.W0, tile, fc.C0), lambda i: (i, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        if tiled_layout
        else pl.BlockSpec((fc.H0, fc.W0, tile, fc.C0), lambda i: (0, 0, i, 0),
                          memory_space=pltpu.VMEM)
    )
    def f(x, packed, ones):
        return pl.pallas_call(
            make_kernel(depth),
            grid=(batch // tile,),
            in_specs=[
                xspec,
                *fc._const_specs(),
                pl.BlockSpec((fc.C0, fc.FC_OUT), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, fc.FC_OUT), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch, fc.FC_OUT), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        )(x, *packed, ones)

    return jax.jit(f)


def main():
    batch, tile = 8192, int(sys.argv[1]) if len(sys.argv) > 1 else 32
    tiled_layout = len(sys.argv) > 2 and sys.argv[2] == "tiled"
    rng = np.random.RandomState(0)
    shape = (batch // tile, 21, 21, tile, 64) if tiled_layout else (21, 21, batch, 64)
    xt = jnp.asarray(rng.randint(0, 256, shape).astype(np.uint8))
    def pr(*shape, s=0.05):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * s)
    params = (pr(2, 2, 64, 32), pr(32), pr(4, 4, 32, 64), pr(64),
              pr(3, 3, 64, 64), pr(64), pr(3136, 512, s=0.01), pr(512))
    packed = jax.device_put(fc._pack_params(params))
    ones = jnp.ones((fc.C0, fc.FC_OUT), jnp.bfloat16)

    fns = [(f"d{d}", build(d, batch, tile, tiled_layout)) for d in range(5)]
    fns.insert(0, ("dA_dma_only", build(-1, batch, tile, tiled_layout)))
    xbf = (xt.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
    fb = build(0, batch, tile, tiled_layout)
    fns.insert(1, ("dB_bf16_in", lambda x, p, o: fb(xbf, p, o)))
    for name, f in fns:  # compile
        float(jax.device_get(jnp.sum(f(xt, packed, ones))))
    meds = {}
    for rep in range(3):
        for name, f in fns:
            t0 = time.perf_counter()
            for _ in range(15):
                r = f(xt, packed, ones)
            float(jax.device_get(jnp.sum(r)))
            dt = (time.perf_counter() - t0) / 15 * 1e3
            meds.setdefault(name, []).append(dt)
            print(f"rep {rep} {name}: {dt:.3f} ms", flush=True)
    print({k: round(statistics.median(v), 3) for k, v in meds.items()})


if __name__ == "__main__":
    main()
