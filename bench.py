"""Headline benchmark: fully-fused PPO env-steps/s per chip.

Runs the complete PPO iteration (rollout scan + GAE + 4 epochs of minibatch
SGD) as one jitted computation on CartPole (pure-JAX env), the rebuild of
BASELINE.json config #1.  The reference's ppo2 on this workload crosses
host<->device three times per env step and allreduces per minibatch; its
practically achievable throughput with subprocess vec-envs is ~30k env
steps/s on a strong host (no official number is published — see SURVEY §6
"no throughput numbers"; 30k is a generous estimate used as vs_baseline
denominator).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax


REFERENCE_FPS_ESTIMATE = 30_000.0


def main():
    from baselines_tpu.algos.common import build_env
    from baselines_tpu.algos.ppo import ppo
    from baselines_tpu.core import logger
    from baselines_tpu.core.rng import seed_key
    from baselines_tpu.core.schedules import resolve_fraction_schedule
    from baselines_tpu.algos.common import adam_optimizer

    logger.configure(format_strs=[])

    num_envs, nsteps = 1024, 128
    nbatch = num_envs * nsteps
    venv = build_env("CartPole-v1", num_envs)
    from baselines_tpu.nn import build_policy
    import jax.numpy as jnp

    policy = build_policy(venv.observation_space, venv.action_space, "mlp")
    key = seed_key(0)
    key, kreset, kinit = jax.random.split(key, 3)
    obs, env_state = venv.reset(kreset)
    params = policy.init(kinit, obs)
    tx = adam_optimizer(0.5)
    state = ppo.PPOTrainState(
        params=params,
        opt_state=tx.init(params),
        key=key,
        env_state=env_state,
        obs=obs,
        rnn_state=None,
        last_done=jnp.zeros((num_envs,), bool),
        update_idx=jnp.zeros((), jnp.int32),
    )
    from baselines_tpu.algos.common import dealias

    state = dealias(state)

    update_fn = jax.jit(
        ppo.make_update_fn(
            policy,
            venv,
            tx,
            nsteps=nsteps,
            nminibatches=4,
            noptepochs=4,
            gamma=0.99,
            lam=0.95,
            ent_coef=0.0,
            vf_coef=0.5,
            lr_fn=resolve_fraction_schedule(3e-4),
            cliprange_fn=resolve_fraction_schedule(0.2),
            nupdates=1000,
        ),
        donate_argnums=0,
    )

    # warmup/compile
    state, metrics = update_fn(state)
    jax.block_until_ready(metrics["policy_loss"])

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = update_fn(state)
    jax.block_until_ready(metrics["policy_loss"])
    dt = time.perf_counter() - t0

    steps_per_s = iters * nbatch / dt
    print(
        f"[bench] ppo2-mlp CartPole fused pipeline: {steps_per_s:,.0f} env-steps/s "
        f"({iters} updates x {nbatch} steps in {dt:.2f}s) on {jax.devices()[0]}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "ppo2_cartpole_env_steps_per_sec_per_chip",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / REFERENCE_FPS_ESTIMATE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
