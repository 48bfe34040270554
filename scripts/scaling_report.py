"""Data-parallel scaling report: fused-PPO env-steps/s at mesh sizes 1..N.

On a pod slice this reports real chips; on a dev box run with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to validate the sharding machinery (numbers then reflect host cores, not
TPUs).  Per-device batch is held constant (weak scaling), matching how the
reference scales MPI ranks with their own envs (cmd_util.py:36-37).
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import os as _os

import jax

# the TPU site plugin forces its platform at interpreter start;
# honor JAX_PLATFORMS so these scripts can run on the CPU backend
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def measure(ndev: int, envs_per_dev: int, nsteps: int, network: str, env_id: str,
            dtype=None, s2d: int = 0):
    from baselines_tpu.algos.common import adam_optimizer, build_env, jit_init
    from baselines_tpu.algos.ppo import ppo
    from baselines_tpu.core.rng import seed_key
    from baselines_tpu.core.schedules import resolve_fraction_schedule
    from baselines_tpu.distributed.mesh import shard_train_state
    from baselines_tpu.nn import build_policy

    num_envs = ndev * envs_per_dev
    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("dp",))
    venv = build_env(env_id, num_envs, s2d=s2d)
    net_kwargs = {"dtype": dtype} if dtype else {}
    policy = build_policy(venv.observation_space, venv.action_space, network, **net_kwargs)
    tx = adam_optimizer(0.5)

    def make_state(key):
        key, kreset, kinit = jax.random.split(key, 3)
        obs, env_state = venv.reset(kreset)
        params = policy.init(kinit, obs)
        return ppo.PPOTrainState(
            params=params, opt_state=tx.init(params), key=key,
            env_state=env_state, obs=obs, rnn_state=None,
            last_done=jnp.zeros((num_envs,), bool),
            update_idx=jnp.zeros((), jnp.int32),
        )

    state = jit_init(make_state, seed_key(0))
    state = shard_train_state(mesh, state, num_envs)
    fn = jax.jit(
        ppo.make_update_fn(
            policy, venv, tx, nsteps=nsteps, nminibatches=4, noptepochs=4,
            gamma=0.99, lam=0.95, ent_coef=0.0, vf_coef=0.5,
            lr_fn=resolve_fraction_schedule(3e-4),
            cliprange_fn=resolve_fraction_schedule(0.2), nupdates=10000,
            ndev=ndev,
        ),
        donate_argnums=0,
    )
    state, m = fn(state)
    float(jax.device_get(m["policy_loss"]))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = fn(state)
    float(jax.device_get(m["policy_loss"]))
    dt = time.perf_counter() - t0
    return iters * num_envs * nsteps / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="CartPole-v1")
    p.add_argument("--network", default="mlp")
    p.add_argument("--envs_per_dev", type=int, default=256)
    p.add_argument("--nsteps", type=int, default=128)
    p.add_argument("--dtype", default=None)
    p.add_argument("--s2d", type=int, default=0)
    args = p.parse_args()

    ndevs = []
    n = 1
    while n <= len(jax.devices()):
        ndevs.append(n)
        n *= 2
    base = None
    print(f"devices: {len(jax.devices())}x {jax.devices()[0].platform}")
    print(f"{'ndev':>5} {'envs':>6} {'steps/s':>14} {'scaling':>8} {'efficiency':>10}")
    for nd in ndevs:
        fps = measure(nd, args.envs_per_dev, args.nsteps, args.network, args.env,
                      dtype=args.dtype, s2d=args.s2d)
        base = base or fps
        print(
            f"{nd:>5} {nd * args.envs_per_dev:>6} {fps:>14,.0f} "
            f"{fps / base:>7.2f}x {fps / base / nd:>9.1%}"
        )


if __name__ == "__main__":
    main()
