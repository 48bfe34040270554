"""Collective helpers — replaces baselines/common/mpi_moments.py,
mpi_util.py, and the consistency checks in mpi_adam.py.

Inside jit with shard_map, use ``jax.lax.psum/pmean`` directly; these
helpers cover the cases the reference handled with host MPI:

- `param_consistency_check`: jitted cross-replica equality assert replacing
  MpiAdam.check_synced (mpi_adam.py:51-61) / MpiAdamOptimizer.check_synced
  (mpi_adam_optimizer.py:53-68) / trpo's param-sum allgather
  (trpo_mpi.py:351-353).  With pjit-replicated params this is an invariant
  by construction, but the check is kept as a cheap debugging probe.
- `host_weighted_mean`: count-weighted mean of logged scalars across hosts
  at log time, replacing mpi_weighted_mean (mpi_util.py:110-132).
- `mpi_moments` analog: distributed mean/std via RunningMeanStd.update with
  an axis_name (see core/running_stats.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psum(x, axis_name: str):
    return jax.tree_util.tree_map(lambda l: jax.lax.psum(l, axis_name), x)


def pmean(x, axis_name: str):
    return jax.tree_util.tree_map(lambda l: jax.lax.pmean(l, axis_name), x)


def tree_sum_scalar(tree) -> jnp.ndarray:
    """Scalar fingerprint of a param pytree (sum of all elements), the
    statistic the reference gossips for consistency checks
    (mpi_adam_optimizer.py:53-60)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def param_consistency_check(params, mesh, atol: float = 1e-5) -> bool:
    """True iff every device holds identical parameters.

    Computes the param-sum fingerprint per shard via shard_map and compares
    (host-side, debug-path only — not for the hot loop).
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def per_shard(p):
        s = tree_sum_scalar(p)
        mx = jax.lax.pmax(s, axis)
        mn = -jax.lax.pmax(-s, axis)
        return mx - mn

    spread = jax.jit(
        jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(),),
            out_specs=P(),
            check_vma=False,
        )
    )(params)
    return bool(abs(float(spread)) <= atol)


def host_weighted_mean(local_name2valcount: dict) -> dict:
    """Count-weighted mean of {name: (value, count)} across all JAX
    processes (mpi_util.py:110-132 parity).  Uses a host allgather via
    multihost_utils only when process_count > 1."""
    if jax.process_count() == 1:
        gathered = [local_name2valcount]
    else:
        gathered = _allgather_pyobj(local_name2valcount)
    name2sum, name2count = {}, {}
    for d in gathered:
        for name, (val, count) in d.items():
            try:
                val = float(val)
            except ValueError:
                if jax.process_index() == 0:
                    import warnings

                    warnings.warn(f"WARNING: tried to compute mean on non-float {name}={val}")
                continue
            name2sum[name] = name2sum.get(name, 0.0) + val * count
            name2count[name] = name2count.get(name, 0) + count
    return {name: name2sum[name] / name2count[name] for name in name2sum}


def _allgather_pyobj(obj):
    """Allgather small python objects across processes via the KV store."""
    import pickle

    from jax.experimental import multihost_utils
    import numpy as np

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    maxlen = 1 << 20
    buf = np.zeros(maxlen, np.uint8)
    buf[: len(payload)] = payload
    lengths = multihost_utils.process_allgather(np.asarray([len(payload)]))
    bufs = multihost_utils.process_allgather(buf)
    out = []
    for i in range(jax.process_count()):
        out.append(pickle.loads(bufs[i, : int(lengths[i][0])].tobytes()))
    return out
