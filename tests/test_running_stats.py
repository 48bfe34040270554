"""RunningMeanStd vs numpy ground truth (reference in-file test:
common/running_mean_std.py:85-117)."""

import jax.numpy as jnp
import numpy as np

from baselines_tpu.core.running_stats import RunningMeanStd


def test_matches_numpy_moments():
    rng = np.random.RandomState(0)
    chunks = [rng.randn(n, 5).astype(np.float32) * 3 + 1 for n in (10, 7, 23)]
    rms = RunningMeanStd.create((5,))
    for c in chunks:
        rms = rms.update(jnp.asarray(c))
    allx = np.concatenate(chunks, 0)
    assert np.allclose(np.asarray(rms.mean), allx.mean(0), atol=1e-3)
    assert np.allclose(np.asarray(rms.var), allx.var(0), atol=1e-3)


def test_scalar_and_normalize():
    rng = np.random.RandomState(2)
    x = rng.randn(1000).astype(np.float32) * 10 + 5
    rms = RunningMeanStd.create(()).update(jnp.asarray(x))
    y = np.asarray(rms.normalize(jnp.asarray(x)))
    assert abs(y.mean()) < 0.05 and abs(y.std() - 1.0) < 0.05
    z = np.asarray(rms.denormalize(rms.normalize(jnp.asarray(x))))
    assert np.allclose(z, x, atol=1e-2)
