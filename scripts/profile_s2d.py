"""Space-to-depth conv1 experiment: 84x84x4 -> 21x21x64 makes the channel
dim 64 (TPU lane-friendly) and turns conv1 8x8s4 into an EXACTLY equivalent
2x2s1 conv (weight bijection). Measures fwd and fwd+bwd of both variants.

python scripts/profile_s2d.py [batch] [dtype]
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
    compiled = jax.jit(fn).lower(*args).compile()
    out = compiled(*args)
    float(jax.device_get(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    float(jax.device_get(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / iters / 16
    print(f"  {name:40s} {dt * 1e3:8.3f} ms/minibatch", flush=True)
    return dt


def space_to_depth(x, b):
    B, H, W, C = x.shape
    x = x.reshape(B, H // b, b, W // b, b, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // b, W // b, b * b * C)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    dtype = jnp.dtype(sys.argv[2]) if len(sys.argv) > 2 else jnp.bfloat16
    print(f"batch={batch} dtype={dtype}", flush=True)
    key = jax.random.PRNGKey(0)
    obs_u8 = jax.random.randint(key, (batch, 84, 84, 4), 0, 255, jnp.int32).astype(jnp.uint8)

    class Orig(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = (x.astype(jnp.float32) / 255.0).astype(dtype)
            h = nn.relu(nn.Conv(32, (8, 8), (4, 4), padding="VALID", dtype=dtype, kernel_init=ortho(np.sqrt(2)), name="c1")(h))
            h = nn.relu(nn.Conv(64, (4, 4), (2, 2), padding="VALID", dtype=dtype, kernel_init=ortho(np.sqrt(2)), name="c2")(h))
            h = nn.relu(nn.Conv(64, (3, 3), (1, 1), padding="VALID", dtype=dtype, kernel_init=ortho(np.sqrt(2)), name="c3")(h))
            h = h.reshape((h.shape[0], -1))
            return nn.relu(nn.Dense(512, dtype=dtype, kernel_init=ortho(np.sqrt(2)), name="fc1")(h)).astype(jnp.float32)

    class S2D(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = space_to_depth(x, 4)  # u8, (B,21,21,64)
            h = (x.astype(jnp.float32) / 255.0).astype(dtype)
            h = nn.relu(nn.Conv(32, (2, 2), (1, 1), padding="VALID", dtype=dtype, kernel_init=ortho(np.sqrt(2)), name="c1")(h))
            h = nn.relu(nn.Conv(64, (4, 4), (2, 2), padding="VALID", dtype=dtype, kernel_init=ortho(np.sqrt(2)), name="c2")(h))
            h = nn.relu(nn.Conv(64, (3, 3), (1, 1), padding="VALID", dtype=dtype, kernel_init=ortho(np.sqrt(2)), name="c3")(h))
            h = h.reshape((h.shape[0], -1))
            return nn.relu(nn.Dense(512, dtype=dtype, kernel_init=ortho(np.sqrt(2)), name="fc1")(h)).astype(jnp.float32)

    class S2DPre(nn.Module):
        """s2d done OUTSIDE (obs already (B,21,21,64))."""

        @nn.compact
        def __call__(self, x):
            h = (x.astype(jnp.float32) / 255.0).astype(dtype)
            h = nn.relu(nn.Conv(32, (2, 2), (1, 1), padding="VALID", dtype=dtype, kernel_init=ortho(np.sqrt(2)), name="c1")(h))
            h = nn.relu(nn.Conv(64, (4, 4), (2, 2), padding="VALID", dtype=dtype, kernel_init=ortho(np.sqrt(2)), name="c2")(h))
            h = nn.relu(nn.Conv(64, (3, 3), (1, 1), padding="VALID", dtype=dtype, kernel_init=ortho(np.sqrt(2)), name="c3")(h))
            h = h.reshape((h.shape[0], -1))
            return nn.relu(nn.Dense(512, dtype=dtype, kernel_init=ortho(np.sqrt(2)), name="fc1")(h)).astype(jnp.float32)

    def scan16_grad(g, obs):
        def run(params):
            def body(p, _):
                grads = g(p, obs)
                return jax.tree_util.tree_map(lambda a, b: a - 1e-7 * b.astype(a.dtype), p, grads), ()
            p, _ = jax.lax.scan(body, params, None, length=16)
            return p
        return run

    obs_s2d = jax.jit(lambda o: space_to_depth(o, 4))(obs_u8)
    for name, mod, obs in [("orig", Orig(), obs_u8), ("s2d-in-net", S2D(), obs_u8), ("s2d-pre", S2DPre(), obs_s2d)]:
        params = mod.init(key, obs[:2])
        g = jax.grad(lambda p, o, m=mod: jnp.sum(m.apply(p, o)))
        timeit(scan16_grad(g, obs), (params,), f"fwd+bwd {name}")


if __name__ == "__main__":
    from baselines_tpu.core import logger

    logger.configure(format_strs=[])
    main()
