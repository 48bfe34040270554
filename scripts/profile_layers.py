"""Layer-level bisection of the PPO-CNN minibatch cost on the real chip.

Each measurement scans the op 16x inside ONE jitted program (matching the
16 minibatch steps of a fused update) so per-dispatch tunnel overhead is
amortized away.

python scripts/profile_layers.py [batch] [dtype]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import os as _os

import jax

# the TPU site plugin forces its platform at interpreter start;
# honor JAX_PLATFORMS so these scripts can run on the CPU backend
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

ortho = nn.initializers.orthogonal


def timeit(fn, args, name, iters=5):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    out = compiled(*args)
    float(jax.device_get(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    float(jax.device_get(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / iters / 16  # per inner step
    print(f"  {name:44s} {dt * 1e3:8.3f} ms/minibatch", flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    dtype = jnp.dtype(sys.argv[2]) if len(sys.argv) > 2 else jnp.float32
    print(f"batch={batch} dtype={dtype}", flush=True)
    key = jax.random.PRNGKey(0)
    obs_u8 = jax.random.randint(key, (batch, 84, 84, 4), 0, 255, jnp.int32).astype(jnp.uint8)

    class Sub(nn.Module):
        nconv: int
        fc: bool = False

        @nn.compact
        def __call__(self, x):
            h = (x.astype(jnp.float32) / 255.0).astype(dtype)
            specs = [(32, 8, 4), (64, 4, 2), (64, 3, 1)][: self.nconv]
            for i, (d, k, s) in enumerate(specs):
                h = nn.relu(nn.Conv(d, (k, k), (s, s), padding="VALID", dtype=dtype,
                                    kernel_init=ortho(np.sqrt(2)), name=f"c{i+1}")(h))
            if self.fc:
                h = h.reshape((h.shape[0], -1))
                h = nn.relu(nn.Dense(512, dtype=dtype, kernel_init=ortho(np.sqrt(2)), name="fc1")(h))
            return h.astype(jnp.float32)

    def scan16_fwd(f):
        """Data-dependent 16x loop: each step's obs is offset by the previous
        output so XLA cannot hoist the body (loop-invariant code motion)."""

        def run(params, obs):
            def body(c, _):
                out = f(params, obs + c)
                return out.astype(jnp.uint8) % 3, out
            _, outs = jax.lax.scan(body, jnp.zeros((), jnp.uint8), None, length=16)
            return outs[-1]

        return run

    def scan16_grad(g):
        """Each step perturbs params with the previous grads (adam-like
        dependence chain)."""

        def run(params, obs):
            def body(p, _):
                grads = g(p, obs)
                p = jax.tree_util.tree_map(lambda a, b: a - 1e-7 * b.astype(a.dtype), p, grads)
                return p, ()
            p, _ = jax.lax.scan(body, params, None, length=16)
            return p

        return run

    # forward-only ladders
    for nconv, fc, name in [(0, False, "cast only"), (1, False, "conv1"),
                            (2, False, "conv1-2"), (3, False, "conv1-3"),
                            (3, True, "full cnn fwd")]:
        m = Sub(nconv=nconv, fc=fc)
        params = m.init(key, obs_u8[:2])
        timeit(scan16_fwd(lambda p, o, m=m: jnp.sum(m.apply(p, o))), (params, obs_u8), f"fwd {name}")

    # fwd+bwd ladders
    for nconv, fc, name in [(1, False, "conv1"), (2, False, "conv1-2"),
                            (3, False, "conv1-3"), (3, True, "full cnn")]:
        m = Sub(nconv=nconv, fc=fc)
        params = m.init(key, obs_u8[:2])
        g = jax.grad(lambda p, o, m=m: jnp.sum(m.apply(p, o)))
        timeit(scan16_grad(g), (params, obs_u8), f"fwd+bwd {name}")


if __name__ == "__main__":
    from baselines_tpu.core import logger

    logger.configure(format_strs=[])
    main()
