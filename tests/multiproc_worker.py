"""Worker body for tests/test_multiprocess.py — one of N jax.distributed
processes (the reference runs its analogous bodies under `mpiexec -n 2`,
common/tests/test_with_mpi.py:14-38).

Run with env: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=2,
JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID.
Argv: <workdir>.  Writes <workdir>/SUCCESS.<pid> on completion.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    workdir = sys.argv[1]

    # the site TPU plugin forces its platform at interpreter start; re-apply
    # the env var (same trick as baselines_tpu/run.py)
    import jax as _jax

    if os.environ.get("JAX_PLATFORMS"):
        _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from baselines_tpu.distributed.mesh import (
        make_mesh,
        maybe_initialize_distributed,
        shard_batch,
    )

    maybe_initialize_distributed()
    maybe_initialize_distributed()  # idempotent (round-1 weak #6)

    import jax
    import jax.numpy as jnp

    assert jax.process_count() == int(os.environ["JAX_NUM_PROCESSES"]), (
        jax.process_count()
    )
    pid = jax.process_index()
    ndev = len(jax.devices())
    assert ndev == 2 * jax.process_count(), ndev
    mesh = make_mesh()

    # 1. the gradient-allreduce analog: a jitted global mean over a
    # process-spanning sharded batch (mpi_adam_optimizer.py:39-46 contract)
    local = np.full((2, 3), float(pid + 1), np.float32)  # 2 local devices
    globl = jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp")), local
    )
    total = jax.jit(lambda x: jnp.sum(x))(globl)
    expect = 3.0 * 2 * sum(range(1, jax.process_count() + 1))
    np.testing.assert_allclose(float(total), expect)

    # 2. data-parallel PPO training over the global mesh + logger reduction:
    # dumpkvs inside learn is now collective (count-weighted mean, process-0
    # write) — this both trains and exercises the logging contract
    from baselines_tpu.algos.ppo import ppo
    from baselines_tpu.core import logger

    logger.configure_for_process(
        pid, dir=workdir, format_strs=["csv"] if pid == 0 else None
    )
    model = ppo.learn(
        env_id="CartPole-v1",
        network="mlp",
        seed=0,
        num_envs=8,
        nsteps=32,
        nminibatches=4,
        noptepochs=2,
        total_timesteps=2048,
        log_interval=1,
        mesh=mesh,
    )

    # 3. replicas hold identical parameters (MpiAdam.check_synced analog)
    from baselines_tpu.distributed.collectives import param_consistency_check

    assert param_consistency_check(model.params, mesh)

    # 4. explicit weighted-mean contract: different values/counts per process
    logger.logkv_mean("probe", float(pid))  # count 1 each
    if pid == 1:
        logger.logkv_mean("probe", 1.0)  # proc1: mean 1.0, count 2
    out = logger.dumpkvs()
    # weighted mean = (0*1 + 1*2) / 3
    if pid == 0:
        np.testing.assert_allclose(out["probe"], 2.0 / 3.0, rtol=1e-6)

    with open(os.path.join(workdir, f"SUCCESS.{pid}"), "w") as f:
        f.write("ok")


if __name__ == "__main__":
    main()
