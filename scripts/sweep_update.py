"""Throughput sweep of the fused PPO update over (num_envs, dtype).

python scripts/sweep_update.py "64:float32" "64:bfloat16" "128:bfloat16" ...
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os as _os

import jax

# the TPU site plugin forces its platform at interpreter start;
# honor JAX_PLATFORMS so these scripts can run on the CPU backend
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp


def run_config(num_envs, nsteps, dtype, s2d=False, iters=10):
    from baselines_tpu.algos.common import adam_optimizer, build_env, jit_init
    from baselines_tpu.algos.ppo import ppo
    from baselines_tpu.core.rng import seed_key
    from baselines_tpu.nn import build_policy

    venv = build_env("AtariSim-v0", num_envs, s2d=4 if s2d else 0)
    kwargs = {} if dtype == "float32" else {"dtype": dtype}
    net = "cnn_s2d" if s2d else "cnn"
    policy = build_policy(venv.observation_space, venv.action_space, net, **kwargs)
    tx = adam_optimizer(0.5)

    def make_state(key):
        key, kreset, kinit = jax.random.split(key, 3)
        obs, env_state = venv.reset(kreset)
        params = policy.init(kinit, obs)
        return ppo.PPOTrainState(
            params=params, opt_state=tx.init(params), key=key, env_state=env_state,
            obs=obs, rnn_state=None, last_done=jnp.zeros((num_envs,), bool),
            update_idx=jnp.zeros((), jnp.int32),
        )

    state = jit_init(make_state, seed_key(0))
    update_fn = jax.jit(
        ppo.make_update_fn(
            policy, venv, tx, nsteps=nsteps, nminibatches=4, noptepochs=4,
            gamma=0.99, lam=0.95, ent_coef=0.01, vf_coef=0.5,
            lr_fn=lambda f: 2.5e-4 * f, cliprange_fn=lambda f: 0.1 * f,
            nupdates=10000,
        ),
        donate_argnums=0,
    )
    t0 = time.perf_counter()
    state, metrics = update_fn(state)
    float(jax.device_get(metrics["policy_loss"]))
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = update_fn(state)
    float(jax.device_get(metrics["policy_loss"]))
    dt = (time.perf_counter() - t0) / iters
    fps = num_envs * nsteps / dt
    print(
        f"envs={num_envs:4d} nsteps={nsteps} dtype={dtype:9s} s2d={int(s2d)}: "
        f"{dt * 1e3:7.2f} ms/update -> {fps:10,.0f} env-steps/s (warm {warm:.1f}s)",
        flush=True,
    )
    return fps


if __name__ == "__main__":
    from baselines_tpu.core import logger

    logger.configure(format_strs=[])
    for spec in sys.argv[1:]:
        parts = spec.split(":")
        envs, dtype = parts[0], parts[1]
        s2d = len(parts) > 2 and parts[2] == "s2d"
        nsteps = 128
        if "x" in envs:
            envs, nsteps = envs.split("x")
        run_config(int(envs), int(nsteps), dtype, s2d=s2d)
