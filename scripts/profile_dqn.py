"""Decompose the DQN chunked update's per-iteration cost on the chip.

Ablations: full config / uniform replay / no-train (env+buffer only) /
small buffer — isolates whether the cost is the train step, the
prioritized machinery, or replay-buffer HBM traffic (donation failures
copy the whole multi-GB buffer every iteration).

python scripts/profile_dqn.py [--envs 64] [--buffer 50000] [--chunk 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os as _os

import jax

if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp


def run(tag, *, envs, buffer_size, chunk, prioritized, train, s2d=4):
    from baselines_tpu.algos.dqn import dqn
    from baselines_tpu.core import logger

    logger.configure(format_strs=[])
    # build the learner's machinery without the outer loop by calling learn
    # for 0 steps is awkward; instead replicate the hot path via learn with
    # a tiny total and time additional chunks through the jitted update.
    import baselines_tpu.algos.dqn.dqn as M

    model_holder = {}

    # monkeypatch-free approach: drive learn for exactly 2 chunks and time
    # the second onward using the CLI-equivalent kwargs
    t0 = time.perf_counter()
    steps = envs * chunk * 12
    model = dqn.learn(
        env_id="AtariSim-v0",
        env_kwargs={"s2d": s2d} if s2d else None,
        network="cnn_s2d" if s2d else "cnn",
        total_timesteps=steps,
        seed=0,
        num_envs=envs,
        buffer_size=buffer_size,
        learning_starts=0 if train else 10**9,
        train_freq=4,
        batch_size=256,
        target_network_update_freq=1000,
        prioritized_replay=prioritized,
        dueling=True,
        double_q=True,
        chunk_size=chunk,
        print_freq=0,
        checkpoint_freq=None,
    )
    jax.block_until_ready(jax.device_get(jax.tree_util.tree_leaves(model.state.params)[0]))
    dt = time.perf_counter() - t0
    per_iter = dt / (steps / envs)
    print(
        f"{tag:34s} {dt:6.1f}s total -> {per_iter * 1e3:7.2f} ms/iter "
        f"({steps / dt:,.0f} env-steps/s incl compile)",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--buffer", type=int, default=50000)
    ap.add_argument("--chunk", type=int, default=64)
    args = ap.parse_args()
    run("full (prioritized+train)", envs=args.envs, buffer_size=args.buffer,
        chunk=args.chunk, prioritized=True, train=True)
    run("uniform replay + train", envs=args.envs, buffer_size=args.buffer,
        chunk=args.chunk, prioritized=False, train=True)
    run("no train (env+buffer add only)", envs=args.envs, buffer_size=args.buffer,
        chunk=args.chunk, prioritized=True, train=False)
    run("full, buffer 5k", envs=args.envs, buffer_size=5000,
        chunk=args.chunk, prioritized=True, train=True)


if __name__ == "__main__":
    main()
