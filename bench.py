"""Headline benchmark: fully-fused PPO env-steps/s per chip.

Two workloads, both with the ENTIRE training iteration (rollout scan + GAE +
minibatch SGD epochs) as one jitted on-device computation:

1. PRIMARY — Atari-scale: nature-CNN PPO on the synthetic AtariSim env
   (84×84×4 uint8 frames, BASELINE.json config #3 shapes) with ppo2's atari
   hyperparameters (nsteps=128, nminibatches=4, noptepochs=4).  The
   reference's ppo2+cnn on real hardware sustains roughly ~1.1k env-steps/s
   (no official number is published — SURVEY §6; 1100 fps is the customary
   figure for ppo2 Atari on a 2018-era GPU and is used as the vs_baseline
   denominator).
2. SECONDARY (stderr) — CartPole MLP pipeline (config #1), reported for
   reference against the subprocess-vec-env ceiling (~30k steps/s).

Prints ONE JSON line for the primary metric.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_CNN_FPS = 1100.0
REFERENCE_MLP_FPS = 30000.0


def build_ppo_update(env_id, num_envs, nsteps, network, nminibatches, noptepochs):
    from baselines_tpu.algos.common import adam_optimizer, build_env, dealias
    from baselines_tpu.algos.ppo import ppo
    from baselines_tpu.core.rng import seed_key
    from baselines_tpu.core.schedules import resolve_fraction_schedule
    from baselines_tpu.nn import build_policy

    venv = build_env(env_id, num_envs)
    policy = build_policy(venv.observation_space, venv.action_space, network)
    key = seed_key(0)
    key, kreset, kinit = jax.random.split(key, 3)
    obs, env_state = venv.reset(kreset)
    params = policy.init(kinit, obs)
    tx = adam_optimizer(0.5)
    state = dealias(
        ppo.PPOTrainState(
            params=params,
            opt_state=tx.init(params),
            key=key,
            env_state=env_state,
            obs=obs,
            rnn_state=None,
            last_done=jnp.zeros((num_envs,), bool),
            update_idx=jnp.zeros((), jnp.int32),
        )
    )
    update_fn = jax.jit(
        ppo.make_update_fn(
            policy,
            venv,
            tx,
            nsteps=nsteps,
            nminibatches=nminibatches,
            noptepochs=noptepochs,
            gamma=0.99,
            lam=0.95,
            ent_coef=0.01,
            vf_coef=0.5,
            lr_fn=resolve_fraction_schedule(2.5e-4),
            cliprange_fn=resolve_fraction_schedule(0.1),
            nupdates=10000,
        ),
        donate_argnums=0,
    )
    return update_fn, state, num_envs * nsteps


def time_updates(update_fn, state, nbatch, iters):
    state, metrics = update_fn(state)  # warmup/compile
    float(jax.device_get(metrics["policy_loss"]))  # hard sync (block_until_ready
    # does not reliably drain the queue on the tunneled axon backend)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = update_fn(state)
    float(jax.device_get(metrics["policy_loss"]))
    dt = time.perf_counter() - t0
    return iters * nbatch / dt, dt


def main():
    from baselines_tpu.core import logger

    # persistent compilation cache makes repeated bench runs cheap
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    logger.configure(format_strs=[])
    dev = jax.devices()[0]

    # primary: Atari-scale CNN pipeline
    # num_envs=32 keeps compile time bounded through the remote-compile
    # relay; 64 envs measures ~77k steps/s but compiles for ~5 minutes
    update_fn, state, nbatch = build_ppo_update(
        "AtariSim-v0", num_envs=32, nsteps=128, network="cnn",
        nminibatches=4, noptepochs=4,
    )
    cnn_fps, dt = time_updates(update_fn, state, nbatch, iters=10)
    print(
        f"[bench] ppo2-cnn AtariSim fused pipeline: {cnn_fps:,.0f} env-steps/s "
        f"(10 updates x {nbatch} steps in {dt:.2f}s) on {dev}",
        file=sys.stderr,
    )

    # secondary: CartPole MLP pipeline
    update_fn, state, nbatch = build_ppo_update(
        "CartPole-v1", num_envs=1024, nsteps=128, network="mlp",
        nminibatches=4, noptepochs=4,
    )
    mlp_fps, dt = time_updates(update_fn, state, nbatch, iters=30)
    print(
        f"[bench] ppo2-mlp CartPole fused pipeline: {mlp_fps:,.0f} env-steps/s "
        f"(vs ~{REFERENCE_MLP_FPS:,.0f} reference ceiling, "
        f"{mlp_fps / REFERENCE_MLP_FPS:,.0f}x)",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "ppo2_cnn_atari_scale_env_steps_per_sec_per_chip",
                "value": round(cnn_fps, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(cnn_fps / REFERENCE_CNN_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
