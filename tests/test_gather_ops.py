"""Row-gather ops: the u32-view fast path and the (interpreter-mode) DMA
kernel both reproduce x[idx] exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from baselines_tpu.ops.gather import take_rows, take_rows_fast


def test_take_rows_fast_u32_view_exact():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 255, (64, 4096), dtype=np.uint8))
    idx = jnp.asarray(rng.permutation(64).astype(np.int32))
    got = np.asarray(jax.device_get(jax.jit(take_rows_fast)(x, idx)))
    want = np.asarray(jax.device_get(x))[np.asarray(idx)]
    np.testing.assert_array_equal(got, want)


def test_take_rows_fast_fallbacks():
    rng = np.random.RandomState(1)
    idx = jnp.asarray(rng.permutation(16).astype(np.int32))
    for x in (
        jnp.asarray(rng.randn(16, 33).astype(np.float32)),  # non-u8
        jnp.asarray(rng.randint(0, 255, (16, 10), dtype=np.uint8)),  # tiny row
        jnp.asarray(rng.randint(0, 255, (16, 8, 8, 64), dtype=np.uint8)),  # rank>2
    ):
        got = np.asarray(jax.device_get(take_rows_fast(x, idx)))
        np.testing.assert_array_equal(got, np.asarray(jax.device_get(x))[np.asarray(idx)])


def test_take_rows_dma_kernel_interpret():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randint(0, 255, (32, 8192), dtype=np.uint8))
    idx = jnp.asarray(rng.randint(0, 32, (32,)).astype(np.int32))
    got = np.asarray(jax.device_get(take_rows(x, idx, interpret=True)))
    np.testing.assert_array_equal(got, np.asarray(jax.device_get(x))[np.asarray(idx)])
