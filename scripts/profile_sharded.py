"""A/B the fused PPO update: unsharded vs dp-sharded on a 1-device mesh.

VERDICT r3 weak #1: BENCH_r03's 198.5k ran the un-sharded program while the
dp path (what `shard_train_state` engages — the layout every real multi-chip
run executes) measured 164.9k in results/scaling/tpu_1chip.txt, i.e. a 17%
"partitioner tax".  This probe measures both paths in ONE process with
interleaved timed chunks (the only trustworthy methodology on the tunneled
axon backend — subprocess diffs are corrupted by first-program stalls) so the
delta is attributable to the program, not the tunnel.
"""

from __future__ import annotations

import argparse
import os.path as osp
import statistics
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import os as _os

import jax

if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def build(env_id, num_envs, nsteps, network, dtype, s2d, mesh=None, unroll=False, remat=False):
    from baselines_tpu.algos.common import adam_optimizer, build_env, jit_init
    from baselines_tpu.algos.ppo import ppo
    from baselines_tpu.core.rng import seed_key
    from baselines_tpu.core.schedules import resolve_fraction_schedule
    from baselines_tpu.distributed.mesh import shard_train_state
    from baselines_tpu.nn import build_policy

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
    if mesh is not None:
        state = shard_train_state(mesh, state, num_envs)
    fn = jax.jit(
        ppo.make_update_fn(
            policy, venv, tx, nsteps=nsteps, nminibatches=4, noptepochs=4,
            gamma=0.99, lam=0.95, ent_coef=0.01, vf_coef=0.5,
            lr_fn=resolve_fraction_schedule(2.5e-4),
            cliprange_fn=resolve_fraction_schedule(0.1), nupdates=10000,
            ndev=mesh.devices.size if mesh is not None else 1,
            unroll=unroll,
            remat=remat,
        ),
        donate_argnums=0,
    )
    return fn, state


def chunk(fn, state, iters):
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = fn(state)
    float(jax.device_get(m["policy_loss"]))
    return state, time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=128)
    p.add_argument("--nsteps", type=int, default=128)
    p.add_argument("--network", default="cnn_s2d")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--s2d", type=int, default=4)
    p.add_argument("--env", default="AtariSim-v0")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--chunks", type=int, default=5)
    p.add_argument("--unroll", action="store_true")
    p.add_argument("--remat", action="store_true")
    args = p.parse_args()
    from baselines_tpu.core import logger

    logger.configure(format_strs=[])
    nbatch = args.envs * args.nsteps
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("dp",))
    dtype = None if args.dtype in (None, "float32") else args.dtype

    variants = {}
    for name, m in (("unsharded", None), ("sharded_1dev", mesh)):
        t0 = time.perf_counter()
        fn, state = build(args.env, args.envs, args.nsteps, args.network, dtype,
                          args.s2d, mesh=m, unroll=args.unroll, remat=args.remat)
        state, _ = chunk(fn, state, 1)  # compile + warmup
        print(f"[{name}] built+compiled in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        variants[name] = (fn, state)

    times = {k: [] for k in variants}
    for c in range(args.chunks):
        for name, (fn, state) in variants.items():
            state, dt = chunk(fn, state, args.iters)
            variants[name] = (fn, state)
            times[name].append(dt / args.iters)
    for name, ts in times.items():
        med = statistics.median(ts)
        print(f"{name:>14}: median {med * 1e3:7.2f} ms/update = {nbatch / med:>10,.0f} steps/s"
              f"   (chunks: {', '.join(f'{t * 1e3:.1f}' for t in ts)})")
    a, b = (statistics.median(times["unsharded"]), statistics.median(times["sharded_1dev"]))
    print(f"sharded/unsharded time ratio: {b / a:.3f} (tax {100 * (b / a - 1):.1f}%)")


if __name__ == "__main__":
    main()
