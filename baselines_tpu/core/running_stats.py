"""Running mean/std statistics as device-resident pytree state.

Parity: baselines/common/running_mean_std.py:5-81 (Welford parallel merge,
running_mean_std.py:22-33) and the MPI-synchronized variant
(common/mpi_running_mean_std.py:8-48).  Instead of TF variables + host
Allreduce, the state is a flax.struct pytree carried through the jitted train
step; cross-replica synchronization is a ``lax.pmean``/``psum`` over a mesh
axis (the batch moments are reduced, not the raw data), replacing
mpi_running_mean_std.py:41-48.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningMeanStd:
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray  # scalar f32

    @staticmethod
    def create(shape=(), epsilon: float = 1e-4, dtype=jnp.float32) -> "RunningMeanStd":
        return RunningMeanStd(
            mean=jnp.zeros(shape, dtype),
            var=jnp.ones(shape, dtype),
            count=jnp.asarray(epsilon, jnp.float32),
        )

    def update(self, x, axis_name: str | None = None) -> "RunningMeanStd":
        """Fold a batch of samples in; leading axes are reduced.

        `x` has shape (batch..., *stat_shape).  With `axis_name`, the batch
        moments are additionally psum-merged across that mesh axis so every
        replica holds identical statistics (mpi_running_mean_std.py:41-48
        equivalent, but on ICI instead of host MPI).
        """
        x = jnp.asarray(x, jnp.float32)
        reduce_axes = tuple(range(x.ndim - self.mean.ndim))
        batch_count = jnp.asarray(
            jnp.prod(jnp.asarray([x.shape[a] for a in reduce_axes], jnp.float32))
            if reduce_axes
            else 1.0,
            jnp.float32,
        )
        batch_mean = jnp.mean(x, axis=reduce_axes)
        batch_var = jnp.var(x, axis=reduce_axes)
        if axis_name is not None:
            n = jax.lax.psum(1, axis_name)
            # merge per-replica moments: mean of means + law of total variance
            g_mean = jax.lax.pmean(batch_mean, axis_name)
            g_var = jax.lax.pmean(batch_var + jnp.square(batch_mean - g_mean), axis_name)
            batch_mean, batch_var = g_mean, g_var
            batch_count = batch_count * n
        return self.update_from_moments(batch_mean, batch_var, batch_count)

    def update_from_moments(self, batch_mean, batch_var, batch_count) -> "RunningMeanStd":
        """Welford/Chan parallel merge (running_mean_std.py:22-33)."""
        delta = batch_mean - self.mean
        tot = self.count + batch_count
        new_mean = self.mean + delta * batch_count / tot
        m_a = self.var * self.count
        m_b = batch_var * batch_count
        m2 = m_a + m_b + jnp.square(delta) * self.count * batch_count / tot
        return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)

    @property
    def std(self):
        return jnp.sqrt(self.var)

    def normalize(self, x, clip: float | None = None, epsilon: float = 1e-8):
        y = (jnp.asarray(x, jnp.float32) - self.mean) / jnp.sqrt(self.var + epsilon)
        if clip is not None:
            y = jnp.clip(y, -clip, clip)
        return y

    def denormalize(self, y, epsilon: float = 1e-8):
        return y * jnp.sqrt(self.var + epsilon) + self.mean


def merge_branched(prev: RunningMeanStd, a: RunningMeanStd, b: RunningMeanStd) -> RunningMeanStd:
    """Exact merge of two statistics that both branched from `prev` and then
    folded in DISJOINT data (the two env groups of a pipelined rollout,
    envs/host_pipeline.py).  Works in (count, sum, sumsq) space where the
    union is simply a + b - prev — the mpi Allreduce-of-moments analog
    (mpi_running_mean_std.py:41-48) for in-process branches.  The common
    branch point is established at init: init_pipe_state seeds BOTH groups
    with the union of their reset contributions (algos/common.py), so the
    merge is exact from the first rollout onward."""

    def sums(r):
        s = r.mean * r.count
        sq = (r.var + jnp.square(r.mean)) * r.count
        return r.count, s, sq

    (cp, sp, qp), (ca, sa, qa), (cb, sb, qb) = sums(prev), sums(a), sums(b)
    count = ca + cb - cp
    mean = (sa + sb - sp) / count
    var = (qa + qb - qp) / count - jnp.square(mean)
    return RunningMeanStd(mean=mean, var=jnp.maximum(var, 0.0), count=count)
