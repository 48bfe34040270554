"""Steady-state DQN throughput decomposition on the chip (VERDICT r3 weak #5/#9).

Methodology (the only trustworthy one on the tunneled axon backend —
results/perf/ANALYSIS_r3.md): everything in ONE process, and each
configuration timed as the DIFFERENCE between a 24-chunk and a 12-chunk
`learn()` call after both programs are jit-cached, which cancels compile,
env construction, and init — leaving 12 pure steady-state chunks.

Ablations isolate where the iteration goes: prioritized vs uniform replay,
train vs env-only, buffer size, and env-count scaling (the per-iteration
latency floor amortizes over envs).

python scripts/profile_dqn.py [--buffer 50000] [--chunk 64]
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


def one_learn(nchunks, *, envs, buffer_size, chunk, prioritized, train, s2d=4,
              chunk_timing=None):
    from baselines_tpu.algos.dqn import dqn
    from baselines_tpu.core import logger

    logger.configure(format_strs=[])
    t0 = time.perf_counter()
    model = dqn.learn(
        chunk_timing=chunk_timing,
        env_id="AtariSim-v0",
        env_kwargs={"s2d": s2d} if s2d else None,
        network="cnn_s2d" if s2d else "cnn",
        total_timesteps=envs * chunk * nchunks,
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
    float(jax.device_get(jax.tree_util.tree_leaves(model.state.params)[0].ravel()[0]))
    logger.reset()
    return time.perf_counter() - t0


def run(tag, **kw):
    import statistics

    times = []
    one_learn(30, **kw, chunk_timing=times)
    # per-chunk medians, first chunk (compile) excluded — the only
    # stall-robust in-process methodology on this backend
    deltas = [b - a for a, b in zip(times[1:], times[2:])]
    per_iter = statistics.median(deltas) / kw["chunk"]
    envs = kw["envs"]
    print(
        f"{tag:42s} {per_iter * 1e3:6.2f} ms/iter = {envs / per_iter:,.0f} env-steps/s steady",
        flush=True,
    )
    return per_iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buffer", type=int, default=50000)
    ap.add_argument("--chunk", type=int, default=64)
    args = ap.parse_args()
    base = dict(envs=64, buffer_size=args.buffer, chunk=args.chunk)
    run("full 64 envs (prioritized+dueling+double)", **base, prioritized=True, train=True)
    run("uniform replay + train", **base, prioritized=False, train=True)
    run("no train (env+buffer add only)", **base, prioritized=True, train=False)
    run("full, buffer 5k", envs=64, buffer_size=5000, chunk=args.chunk,
        prioritized=True, train=True)
    run("full 128 envs", envs=128, buffer_size=args.buffer, chunk=args.chunk,
        prioritized=True, train=True)
    run("full 256 envs", envs=256, buffer_size=args.buffer, chunk=args.chunk,
        prioritized=True, train=True)


if __name__ == "__main__":
    main()
