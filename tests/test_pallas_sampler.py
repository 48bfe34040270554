"""Pallas stratified sampler vs the XLA cumsum+searchsorted reference
(interpret mode on the CPU test mesh; the kernel itself is exercised
compiled on real TPU by bench/perf runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from baselines_tpu.data.pallas_sampler import BLOCK, ROWS_PER_TILE, pallas_stratified_sample


def test_pallas_sampler_matches_reference():
    N = ROWS_PER_TILE * BLOCK  # minimum conformant size
    rng = np.random.RandomState(0)
    prios = jnp.asarray(np.abs(rng.randn(N)).astype(np.float32))
    u = jnp.asarray(rng.rand(128).astype(np.float32))
    idx = np.asarray(pallas_stratified_sample(prios, u, 128, interpret=True))

    cum = jnp.cumsum(prios)
    targets = (jnp.arange(128) + u) / 128 * cum[-1]
    ref = np.clip(
        np.asarray(jnp.searchsorted(cum, targets, side="right")), 0, N - 1
    )
    # blockwise vs global float summation can shift a boundary by ±2 slots
    assert np.abs(idx - ref).max() <= 2
    assert (idx != ref).mean() < 0.05


def test_pallas_sampler_distribution():
    """Sampled frequencies follow the priority masses."""
    N = ROWS_PER_TILE * BLOCK
    prios = np.full(N, 1e-3, np.float32)
    prios[7] = N * 1e-3  # ~half the total mass
    prios = jnp.asarray(prios)
    counts = np.zeros(N)
    for i in range(20):
        u = jax.random.uniform(jax.random.PRNGKey(i), (256,))
        idx = np.asarray(pallas_stratified_sample(prios, u, 256, interpret=True))
        counts += np.bincount(idx, minlength=N)
    frac7 = counts[7] / counts.sum()
    expected = float(prios[7] / prios.sum())
    assert abs(frac7 - expected) < 0.05
