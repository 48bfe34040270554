"""Pallas TPU kernel: the fused s2d Nature-CNN stack (conv1-conv2-conv3-fc).

STATUS — BUILT, MEASURED, NOT THE PRODUCTION PATH.  This is the kernel
VERDICT r4 item 1 scoped (batch-tiled VMEM-resident activations).  It was
built, verified on-chip (rel err 6e-4 vs XLA at batch 8192), and measured:
forward 7.37 ms vs XLA's 2.85 ms — the round-4 premise that XLA's conv
activation HBM round trips dominate is FALSE on this chip.  The full
measured ledger (depth-knockout, DMA-only and bf16-input probes, layout
variants, MXU-utilization analysis, why a backward would lose worse) is in
results/perf/ANALYSIS_r5.md; headline causes:

  - Mosaic lowering constraints force per-tap matmuls in a spatial-major
    (H, W, B, C) layout (details below), whose 32/64-channel contractions
    cap the MXU at 1/8-1/4 utilization.  That puts the kernel's pure-MXU
    floor (~4.7 ms) ABOVE XLA's entire measured forward (2.85 ms at 41%
    effective efficiency) — no amount of DMA tuning can win from there.
  - The pipelined u8 block DMA sustains only ~65 GB/s (u8 lane padding:
    a (..., B, 64) u8 block pads lanes 64->128), measured identical for
    batch-strided and fully contiguous pre-tiled HBM layouts.

The kernel stays in-tree, interpreter-tested (tests/test_fused_cnn.py),
as the reproducible negative result — the same pattern as ops/gather.py's
ring-DMA kernel.

Design (what Mosaic on this image accepts):
  forward:  u8 obs tile -> (conv 2x2s1 + relu) -> (conv 4x4s2 + relu)
            -> (conv 3x3s1 + relu) -> (dense 3136->512 + relu)
            only the 512-f32 latent returns to HBM; convs are per-tap
            shifted-slice matmuls (no im2col copy).
  layout:   (H, W, B, C) spatial-major, because Mosaic rejects B-major
            operand flattens like (B,7,7,64)->(B*49,64) (7 is not
            sublane-tile-exact), rejects >2D strided slices (lowered as
            gathers), has no u8->f32 cast (widened via i32), and its AOT
            compiler crashes on the 4D in-kernel transpose — so the
            caller transposes obs outside (fused into the minibatch copy).

Semantics parity: identical math to nn/networks.py NatureCNNS2D (dtype
bfloat16, f32 accumulation, biases and relu in f32, latent returned f32)
which is itself the Nature DQN stack of the reference
(baselines/common/models.py:15-26) on space-to-depth-packed frames.

Known toolchain constraints honored (ops/gather.py ledger): no sliced-HBM-
destination DMAs anywhere — all HBM I/O goes through BlockSpec-pipelined
block transfers, which this image's AOT compiler handles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# geometry of the s2d-packed Atari stack (VecS2D: 84x84x4 -> 21x21x64)
H0, W0, C0 = 21, 21, 64
H1, W1, C1 = 20, 20, 32    # conv1 2x2 s1
H2, W2, C2 = 9, 9, 64      # conv2 4x4 s2
H3, W3, C3 = 7, 7, 64      # conv3 3x3 s1
FC_IN, FC_OUT = H3 * W3 * C3, 512

_INV255 = 1.0 / 255.0


def _tap_matmul(xs, w, acc):
    m = jax.lax.dot_general(
        xs, w, (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return m if acc is None else acc + m


def _conv_taps(x, w_ref, kh, kw, out_h, out_w):
    """Stride-1 conv as kh*kw shifted-slice matmuls, in (H, W, B, Cin)
    layout: spatial slices touch only OUTER vector dims (free re-addressing)
    and the dot_general operand flatten collapses (out_h, out_w, B) onto the
    batch/sublane dim, which is tile-exact for B a multiple of 8 — the only
    layout this image's Mosaic accepts for these shapes (B-major flattens
    like (B,7,7,64)->(B*49,64) are rejected: 7 is not sublane-tile-exact).

    Returns f32 (out_h, out_w, B, Cout)."""
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            xs = x[dy : dy + out_h, dx : dx + out_w, :, :]
            acc = _tap_matmul(xs, w_ref[dy * kw + dx], acc)
    return acc


def _conv_taps_s2(x, w_ref, kh, kw, out_h, out_w):
    """Stride-2 conv via even/odd phase decomposition: strided slices lower
    to (unsupported >2D) gathers in Mosaic, so split x once into its four
    parity phases with an outer-dim reshape + static index (pure
    re-addressing in (H, W, B, C) layout), then every tap is a plain
    contiguous slice of one phase."""
    h, w, b, c = x.shape
    r = x.reshape(h // 2, 2, w // 2, 2, b, c)
    ph = [[r[:, p, :, q, :, :] for q in range(2)] for p in range(2)]
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            src = ph[dy % 2][dx % 2]
            xs = src[dy // 2 : dy // 2 + out_h, dx // 2 : dx // 2 + out_w, :, :]
            acc = _tap_matmul(xs, w_ref[dy * kw + dx], acc)
    return acc


def _forward_body(x_ref, w1, b1, w2, b2, w3, b3, wfc, bfc):
    """Shared fwd recompute: returns (x, a1, a2, a3, latent_pre_relu) values.

    x_ref is (H0, W0, B, C0) u8 — the caller transposes observations to the
    spatial-major layout once, outside the kernel (XLA folds that transpose
    into the minibatch gather); Mosaic cannot lower the 4D transpose
    in-kernel (AOT compiler crash, same class as the ops/gather.py ledger).
    a* are post-relu bf16 activations (relu masks are recoverable as a > 0:
    ties at exactly 0 contribute zero gradient either way)."""
    # Mosaic has no direct u8 -> f32 cast; widen through i32 first
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32) * _INV255
    x = x.astype(jnp.bfloat16)
    z1 = _conv_taps(x, w1, 2, 2, H1, W1) + b1[:]
    a1 = jnp.maximum(z1, 0.0).astype(jnp.bfloat16)
    z2 = _conv_taps_s2(a1, w2, 4, 4, H2, W2) + b2[:]
    a2 = jnp.maximum(z2, 0.0).astype(jnp.bfloat16)
    z3 = _conv_taps(a2, w3, 3, 3, H3, W3) + b3[:]
    a3 = jnp.maximum(z3, 0.0).astype(jnp.bfloat16)
    # fc over the flattened (7,7,64) activation WITHOUT a flatten: Mosaic
    # can't shape-cast (B,7,7,64) -> (B,3136), so contract one spatial
    # position at a time against the (49, 64, 512) tap-major fc weight
    z4 = None
    for y in range(H3):
        for xp in range(W3):
            z4 = _tap_matmul_2d(a3[y, xp], wfc[y * W3 + xp], z4)
    z4 = z4 + bfc[:]
    return x, a1, a2, a3, z4


def _tap_matmul_2d(xs, w, acc):
    m = jax.lax.dot_general(
        xs, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return m if acc is None else acc + m


def _fwd_kernel(x_ref, w1, b1, w2, b2, w3, b3, wfc, bfc, out_ref):
    *_, z4 = _forward_body(x_ref, w1, b1, w2, b2, w3, b3, wfc, bfc)
    out_ref[:] = jnp.maximum(z4, 0.0)


def _pack_params(params):
    """flax-layout conv kernels -> tap-major (k*k, Cin, Cout) bf16."""
    w1, b1, w2, b2, w3, b3, wfc, bfc = params
    return (
        w1.reshape(4, C0, C1).astype(jnp.bfloat16),
        b1.astype(jnp.float32),
        w2.reshape(16, C1, C2).astype(jnp.bfloat16),
        b2.astype(jnp.float32),
        w3.reshape(9, C2, C3).astype(jnp.bfloat16),
        b3.astype(jnp.float32),
        wfc.reshape(H3 * W3, C3, FC_OUT).astype(jnp.bfloat16),
        bfc.astype(jnp.float32),
    )


def _const_specs():
    """Weights: whole-array blocks, VMEM-resident across the batch grid."""
    return [
        pl.BlockSpec((4, C0, C1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C1,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((16, C1, C2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C2,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((9, C2, C3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C3,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (H3 * W3, C3, FC_OUT), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((FC_OUT,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]


def _fwd_tile(batch: int, cap: int) -> int:
    for t in (cap, 64, 32, 16, 8):
        if t <= cap and batch % t == 0:
            return t
    return 0


@partial(jax.jit, static_argnames=("interpret", "tile"))
def _fused_fwd(x, packed, interpret=False, tile=32):
    batch = x.shape[2]  # x arrives spatial-major: (H0, W0, B, C0)
    bt = _fwd_tile(batch, tile)
    assert bt, f"batch {batch} not tileable"
    return pl.pallas_call(
        _fwd_kernel,
        grid=(batch // bt,),
        in_specs=[
            pl.BlockSpec(
                (H0, W0, bt, C0), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
            ),
            *_const_specs(),
        ],
        out_specs=pl.BlockSpec(
            (bt, FC_OUT), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, FC_OUT), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, *packed)


# ---------------------------------------------------------------------------
# reference (pure-XLA) implementation, used for tests and as the fallback


def reference_forward(x, params):
    """Bit-for-bit the NatureCNNS2D(dtype=bf16) math, in plain jnp."""
    w1, b1, w2, b2, w3, b3, wfc, bfc = params
    h = (x.astype(jnp.float32) * _INV255).astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(h.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))

    def conv(h, w, b, stride):
        z = jax.lax.conv_general_dilated(
            h, w.astype(jnp.bfloat16), (stride, stride), "VALID",
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
        return jnp.maximum(z + b, 0.0).astype(jnp.bfloat16)

    h = conv(h, w1, b1, 1)
    h = conv(h, w2, b2, 2)
    h = conv(h, w3, b3, 1)
    z4 = (
        jax.lax.dot_general(
            h.reshape(h.shape[0], -1), wfc.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        + bfc
    )
    return jnp.maximum(z4, 0.0)


def fused_cnn_forward(x, params, interpret=False, tile=32):
    """Public fwd entry: x (B, 21, 21, 64) u8, params in flax layout
    ((2,2,64,32), (32,), (4,4,32,64), (64,), (3,3,64,64), (64,),
    (3136,512), (512,)).  Returns (B, 512) f32.

    The spatial-major transpose happens here in XLA-land (it fuses into
    whatever copy produced x — e.g. the epoch-shuffle minibatch gather)."""
    xt = jnp.transpose(x, (1, 2, 0, 3))
    return _fused_fwd(xt, _pack_params(params), interpret=interpret, tile=tile)
