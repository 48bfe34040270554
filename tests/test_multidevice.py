"""Multi-device tests on the 8-way virtual CPU mesh — replacing the
reference's @with_mpi subprocess tests (common/tests/test_with_mpi.py,
mpi_adam.py:63-99): collectives, state sharding, and a sharded PPO update.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from baselines_tpu.core import logger
from baselines_tpu.distributed import (
    DATA_AXIS,
    data_sharding,
    make_mesh,
    param_consistency_check,
)
from baselines_tpu.distributed.mesh import shard_train_state


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_psum_over_mesh():
    mesh = make_mesh()

    def f(x):
        return jax.lax.psum(jnp.sum(x), DATA_AXIS)

    x = jax.device_put(jnp.ones((16, 4)), data_sharding(mesh, 2))
    total = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=(P(DATA_AXIS, None),), out_specs=P())
    )(x)
    assert float(total) == 64.0


def test_param_consistency_check():
    mesh = make_mesh()
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    from baselines_tpu.distributed.mesh import replicate

    params = replicate(mesh, params)
    assert param_consistency_check(params, mesh)


def test_sharded_ppo_update_runs():
    """Full PPO train step jitted over an 8-device mesh: env axis sharded,
    params replicated — the dryrun_multichip path."""
    from baselines_tpu.algos.ppo.ppo import learn

    logger.configure(format_strs=[])
    mesh = make_mesh()
    model = learn(
        env_id="CartPole-v1",
        network="mlp",
        total_timesteps=2 * 16 * 16,  # 2 updates
        seed=0,
        num_envs=16,
        nsteps=16,
        nminibatches=2,
        noptepochs=2,
        log_interval=1000,
        mesh=mesh,
    )
    leaves = jax.tree_util.tree_leaves(model.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    logger.reset()


def test_running_stats_axis_sync():
    """Distributed normalizer moments equal the single-stream result
    (mpi_running_mean_std.py:69-107 analog)."""
    from baselines_tpu.core.running_stats import RunningMeanStd

    mesh = make_mesh()
    rng = np.random.RandomState(0)
    x = rng.randn(64, 3).astype(np.float32) * 2 + 1

    def f(xs):
        rms = RunningMeanStd.create((3,))
        return rms.update(xs, axis_name=DATA_AXIS)

    xs = jax.device_put(jnp.asarray(x), data_sharding(mesh, 2))
    out = jax.jit(
        jax.shard_map(
            f, mesh=mesh, in_specs=(P(DATA_AXIS, None),), out_specs=P()
        )
    )(xs)
    assert np.allclose(np.asarray(out.mean), x.mean(0), atol=1e-4)
    assert np.allclose(np.asarray(out.var), x.var(0), atol=1e-4)
