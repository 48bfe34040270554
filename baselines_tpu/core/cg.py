"""Conjugate gradient — parity with baselines/common/cg.py:2-34, as a
fixed-trip lax loop usable inside jit (early exit becomes a frozen carry so
every replica runs identical iteration counts — required for collectives
inside the operator)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cg(f_Ax, b, cg_iters: int = 10, residual_tol: float = 1e-10):
    """Solve Ax = b for symmetric positive-definite A given v ↦ Av."""

    def body(_, carry):
        x, r, p, rdotr = carry
        z = f_Ax(p)
        v = rdotr / jnp.maximum(jnp.dot(p, z), 1e-12)
        x = x + v * p
        r = r - v * z
        newrdotr = jnp.dot(r, r)
        mu = newrdotr / jnp.maximum(rdotr, 1e-12)
        p = r + mu * p
        done = newrdotr < residual_tol
        return jax.tree_util.tree_map(
            lambda new, old: jnp.where(done, old, new), (x, r, p, newrdotr), carry
        )

    x0 = jnp.zeros_like(b)
    out = jax.lax.fori_loop(0, cg_iters, body, (x0, b, b, jnp.dot(b, b)))
    return out[0]
