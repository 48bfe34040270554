"""Device-mesh construction — the TPU-native replacement for the reference's
MPI process topology (baselines/common/mpi_util.py, mpi_fork.py).

The reference launches N OS processes under mpirun and allreduces gradients
on the host NIC (mpi_adam_optimizer.py:39-46).  Here the model of
parallelism is a ``jax.sharding.Mesh`` with a single ``dp`` axis spanning
every chip in the slice: parameters are replicated (PartitionSpec()),
rollout/batch data is sharded on axis 0 (PartitionSpec('dp')), and XLA
compiles the gradient reduction into the update step as an ICI all-reduce —
there is no host round-trip and no explicit parameter broadcast
(`sync_from_root`, mpi_util.py:15-26, is subsumed by replication).

Multi-host: call ``maybe_initialize_distributed()`` once per process (the
``jax.distributed`` analog of mpirun), after which ``jax.devices()`` spans
the whole pod slice and the same mesh code works unchanged — collectives
ride ICI within a slice and DCN across slices, chosen by XLA from the device
topology.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"


_distributed_initialized = False


def maybe_initialize_distributed() -> None:
    """Initialize the multi-host runtime when launched with coordinator env
    vars set (mpi_fork.py:3-23 / mpirun-launch analog).  No-op single-host,
    idempotent across repeated calls, and safe after an explicit
    jax.distributed.initialize() (jax raises if doubly initialized; the
    module-level flag plus the client check avoid that)."""
    global _distributed_initialized
    if _distributed_initialized:
        return
    if not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return
    # an already-created distributed client (explicit user init) must not be
    # re-initialized
    from jax._src import distributed as _jdist

    if getattr(_jdist.global_state, "client", None) is not None:
        _distributed_initialized = True
        return
    # explicit launcher env vars (the mpirun -np N re-exec contract of
    # mpi_fork.py:3-23): JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES +
    # JAX_PROCESS_ID; cluster auto-detection covers managed environments
    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs = dict(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)
    _distributed_initialized = True


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """A 1-D data-parallel mesh over all (or the given) devices.

    The reference's only scale-out strategy is data parallelism over MPI
    ranks (SURVEY §2.5); models are tiny, so a 1-D dp mesh is the idiomatic
    TPU mapping.  Model-parallel axes can be appended later without touching
    call sites that use PartitionSpec names.
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, ndim: int = 1, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 (the env/batch axis) across the mesh; rest replicated."""
    spec = P(axis_name, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree with axis-0 sharded across the dp axis."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), tree
    )


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_train_state(mesh: Mesh, state, num_envs: int):
    """Lay out an algorithm train state for data parallelism: every leaf with
    a leading axis of length num_envs (env state, obs, rnn carries, done
    flags) is sharded over the dp axis; everything else (params, optimizer
    state, rng, counters, episode ring buffers) is replicated.  XLA then
    compiles the batch gradient mean inside the jitted update into an ICI
    all-reduce — the reference's per-minibatch host Allreduce
    (mpi_adam_optimizer.py:39-46) becomes a fused on-device collective."""
    ndev = mesh.devices.size
    assert num_envs % ndev == 0, (
        f"num_envs={num_envs} must be divisible by mesh size {ndev}"
    )

    def put(x):
        if np.ndim(x) >= 1 and np.shape(x)[0] == num_envs:
            return jax.device_put(x, data_sharding(mesh, np.ndim(x)))
        return jax.device_put(x, replicated_sharding(mesh))

    return jax.tree_util.tree_map(put, state)
