"""Fused conv-stack Pallas kernel: interpret-mode bit-level checks.

The kernel is NOT the production path (it loses to XLA's conv codegen on
this image — measured ledger in results/perf/ANALYSIS_r5.md and the module
docstring); these tests keep it correct so the negative result stays
reproducible, the same pattern as ops/gather.py's ring-DMA kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baselines_tpu.ops import fused_cnn as fc


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 256, (16, 21, 21, 64)).astype(np.uint8))

    def pr(*shape, s=0.05):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * s)

    params = (
        pr(2, 2, 64, 32), pr(32), pr(4, 4, 32, 64), pr(64),
        pr(3, 3, 64, 64), pr(64), pr(3136, 512, s=0.01), pr(512),
    )
    return x, params


def test_forward_matches_xla_reference(setup):
    x, params = setup
    ref = np.asarray(fc.reference_forward(x, params))
    got = np.asarray(fc.fused_cnn_forward(x, params, interpret=True))
    assert ref.shape == got.shape == (16, 512)
    rel = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-2, rel
    # the stack must actually fire (non-degenerate activations)
    assert (ref > 0).mean() > 0.1


def test_reference_matches_flax_module(setup):
    """reference_forward IS the NatureCNNS2D(dtype=bf16) math — tie the two
    so kernel tests can trust the pure-jnp reference."""
    x, params = setup
    from baselines_tpu.nn.networks import NatureCNNS2D

    w1, b1, w2, b2, w3, b3, wfc, bfc = params
    net = NatureCNNS2D(dtype=jnp.bfloat16)
    tree = net.init(jax.random.PRNGKey(0), x[:2])
    tree = jax.tree_util.tree_map(lambda v: v, tree)
    tree = {
        "params": {
            "c1": {"kernel": w1, "bias": b1},
            "c2": {"kernel": w2, "bias": b2},
            "c3": {"kernel": w3, "bias": b3},
            "fc1": {"kernel": wfc, "bias": bfc},
        }
    }
    a = np.asarray(net.apply(tree, x))
    b = np.asarray(fc.reference_forward(x, params))
    # atol covers bf16 rounding of near-zero post-relu values (flax
    # accumulates conv sums in a different association order)
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=3e-3)


def test_tile_sizes_agree(setup):
    x, params = setup
    a = np.asarray(fc.fused_cnn_forward(x, params, interpret=True, tile=8))
    b = np.asarray(fc.fused_cnn_forward(x, params, interpret=True, tile=16))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
