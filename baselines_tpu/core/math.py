"""Small math utilities (device-side).

Parity targets: baselines/common/math_util.py (discount :8-27,
explained_variance :29-47) and tf_util.huber_loss
(baselines/common/tf_util.py:39-49) — rebuilt on jnp / lax.scan instead of
scipy.signal.lfilter and TF ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def discount(x, gamma):
    """y[t] = x[t] + gamma*x[t+1] + gamma^2*x[t+2] + ... along axis 0.

    The reference uses scipy lfilter (math_util.py:8-27); here it is a reverse
    lax.scan, which XLA compiles to a single fused loop on device.
    """
    x = jnp.asarray(x)

    def body(carry, xt):
        y = xt + gamma * carry
        return y, y

    _, ys = jax.lax.scan(body, jnp.zeros_like(x[0]), x, reverse=True)
    return ys


def explained_variance(ypred, y):
    """1 - Var[y - ypred] / Var[y], nan when Var[y]==0 (math_util.py:29-47)."""
    ypred = jnp.asarray(ypred, jnp.float32).ravel()
    y = jnp.asarray(y, jnp.float32).ravel()
    vary = jnp.var(y)
    ev = 1.0 - jnp.var(y - ypred) / vary
    return jnp.where(vary == 0, jnp.nan, ev)


def huber_loss(x, delta: float = 1.0):
    """Quadratic within |x|<=delta, linear outside (tf_util.py:39-49)."""
    x = jnp.asarray(x)
    abs_x = jnp.abs(x)
    quad = jnp.minimum(abs_x, delta)
    return 0.5 * quad * quad + delta * (abs_x - quad)


def global_norm(tree):
    """L2 norm over a pytree of arrays (tf.global_norm equivalent)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.float32(0.0)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))


def flatten_tree(tree):
    """Concatenate all leaves into one flat f32 vector — the analog of
    GetFlat/flatgrad (tf_util.py:230-262), used by TRPO's CG."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate([jnp.ravel(l).astype(jnp.float32) for l in leaves])


def unflatten_like(vec, tree):
    """Inverse of flatten_tree given a template pytree (SetFromFlat analog,
    tf_util.py:239-255)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out, i = [], 0
    for l in leaves:
        n = l.size
        out.append(jnp.reshape(vec[i : i + n], l.shape).astype(l.dtype))
        i += n
    return jax.tree_util.tree_unflatten(treedef, out)
