"""Decompose the fused PPO update's time on the real chip (VERDICT r2 #2).

Times, as separately-jitted programs on the benchmark config (AtariSim
64x128 nature-CNN unless overridden):
  - full update (the bench primary)
  - rollout scan only (policy.step + env.step x nsteps)
  - GAE only
  - epoch shuffle gather only (the x[perm] full-batch gather, x4 epochs)
  - train only (4 epochs x 4 minibatches fwd+bwd+adam on a fixed batch)
  - policy fwd at rollout batch (one step) and at minibatch batch
plus throughput variants (128 envs, bf16) of the full update.

Usage:  python scripts/profile_update.py [--envs 64] [--nsteps 128] [--quick]
Writes a markdown summary to stdout; run on the TPU backend.
"""

import argparse
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


def hard_sync(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    float(jax.device_get(jnp.sum(leaves[0].astype(jnp.float32))))


def bench_fn(fn, args, iters, name):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    out = compiled(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    hard_sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"  {name:40s} {dt * 1e3:9.2f} ms/iter  (compile {t_compile:.1f}s)", file=sys.stderr, flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--nsteps", type=int, default=128)
    ap.add_argument("--network", default="cnn")
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--s2d", type=int, default=0)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from baselines_tpu.algos.common import adam_optimizer, build_env, jit_init, run_rollout
    from baselines_tpu.algos.ppo import ppo
    from baselines_tpu.core import logger
    from baselines_tpu.core.rng import seed_key
    from baselines_tpu.data.gae import gae
    from baselines_tpu.nn import build_policy

    logger.configure(format_strs=[])
    N, T = args.envs, args.nsteps
    iters = 3 if args.quick else 10
    venv = build_env("AtariSim-v0", N, s2d=args.s2d)
    net_kwargs = {"dtype": args.dtype} if args.dtype else {}
    policy = build_policy(venv.observation_space, venv.action_space, args.network, **net_kwargs)
    tx = adam_optimizer(0.5)

    def make_state(key):
        key, kreset, kinit = jax.random.split(key, 3)
        obs, env_state = venv.reset(kreset)
        params = policy.init(kinit, obs)
        return dict(params=params, opt=tx.init(params), key=key, env_state=env_state, obs=obs)

    s = jit_init(make_state, seed_key(0))
    print(f"config: {N} envs x {T} steps, network={args.network}", file=sys.stderr, flush=True)

    results = {}

    # --- full update (the bench primary)
    update_fn = ppo.make_update_fn(
        policy, venv, tx, nsteps=T, nminibatches=4, noptepochs=4,
        gamma=0.99, lam=0.95, ent_coef=0.01, vf_coef=0.5,
        lr_fn=lambda f: 2.5e-4 * f, cliprange_fn=lambda f: 0.1 * f, nupdates=10000,
    )
    train_state = ppo.PPOTrainState(
        params=s["params"], opt_state=s["opt"], key=s["key"], env_state=s["env_state"],
        obs=s["obs"], rnn_state=None, last_done=jnp.zeros((N,), bool),
        update_idx=jnp.zeros((), jnp.int32),
    )
    results["full_update"] = bench_fn(lambda st: update_fn(st), (train_state,), iters, "full update")

    # --- rollout only
    def rollout_only(params, key, env_state, obs):
        key, env_state, obs, _, last_done, traj, last_value = run_rollout(
            policy, venv, params, key, env_state, obs, None, jnp.zeros((N,), bool), T
        )
        return traj, last_value, key, env_state, obs

    results["rollout"] = bench_fn(
        rollout_only, (s["params"], s["key"], s["env_state"], s["obs"]), iters, "rollout scan only"
    )

    # materialize one trajectory for the downstream pieces
    traj, last_value, *_ = jax.jit(rollout_only)(s["params"], s["key"], s["env_state"], s["obs"])

    # --- GAE only
    results["gae"] = bench_fn(
        lambda tr, lv: gae(tr.rewards, tr.values, tr.dones, lv, 0.99, 0.95),
        (traj, last_value), iters, "gae only",
    )

    # --- epoch shuffle gather only (x4 epochs, all fields)
    nbatch = N * T
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((nbatch,) + x.shape[2:]),
        (traj.obs, traj.actions, traj.values, traj.neglogps),
    )

    def shuffle4(key, flat):
        # consume EVERY gathered element: the round-4 version summed
        # x[perm][:1], which let XLA slice-of-gather away all but one row —
        # the "39.4 ms" it printed measured almost nothing (r5 ledger)
        def epoch(c, ekey):
            perm = jax.random.permutation(ekey, nbatch)
            s = jax.tree_util.tree_map(
                lambda x: jnp.sum(x[perm].astype(jnp.float32)), flat
            )
            return c + sum(jax.tree_util.tree_leaves(s)), None
        c, _ = jax.lax.scan(epoch, jnp.float32(0), jax.random.split(key, 4))
        return c

    results["shuffle_x4"] = bench_fn(shuffle4, (s["key"], flat), iters, "epoch perm-gather x4 (all fields)")

    # --- train only: 4 epochs x 4 minibatches on a fixed batch
    advs, returns = jax.jit(lambda tr, lv: gae(tr.rewards, tr.values, tr.dones, lv, 0.99, 0.95))(traj, last_value)
    batch_t = (traj.obs, traj.actions, returns, traj.values, traj.neglogps, traj.rnn_masks)
    loss_fn = ppo.make_ppo_loss(policy, 0.01, 0.5)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    flat01 = lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])
    from baselines_tpu.algos.common import apply_updates_lr

    def train_only(params, opt_state, key, batch_t):
        batch_flat = jax.tree_util.tree_map(flat01, batch_t)
        nbt = nbatch // 4

        def mb_step(carry, mb):
            params, opt_state = carry
            _, _, mb_ret, mb_val, _, _ = mb
            a = mb_ret - mb_val
            a = (a - a.mean()) / (a.std() + 1e-8)
            (_, metrics), grads = grad_fn(params, mb, a, 0.1, None)
            params, opt_state = apply_updates_lr(tx, params, opt_state, grads, 2.5e-4)
            return (params, opt_state), metrics

        def epoch(carry, ekey):
            perm = jax.random.permutation(ekey, nbatch)
            mbs = jax.tree_util.tree_map(
                lambda x: x[perm].reshape((4, nbt) + x.shape[1:]), batch_flat
            )
            return jax.lax.scan(mb_step, carry, mbs)

        (params, opt_state), m = jax.lax.scan(epoch, (params, opt_state), jax.random.split(key, 4))
        return params, opt_state, m

    results["train_epochs"] = bench_fn(
        train_only, (s["params"], s["opt"], s["key"], batch_t), iters, "train (4 epochs x 4 mb, incl shuffle)"
    )

    # --- train without the shuffle (sequential minibatches)
    def train_noshuffle(params, opt_state, batch_t):
        batch_flat = jax.tree_util.tree_map(flat01, batch_t)
        nbt = nbatch // 4

        def mb_step(carry, mb):
            params, opt_state = carry
            _, _, mb_ret, mb_val, _, _ = mb
            a = mb_ret - mb_val
            a = (a - a.mean()) / (a.std() + 1e-8)
            (_, metrics), grads = grad_fn(params, mb, a, 0.1, None)
            params, opt_state = apply_updates_lr(tx, params, opt_state, grads, 2.5e-4)
            return (params, opt_state), metrics

        def epoch(carry, _):
            mbs = jax.tree_util.tree_map(
                lambda x: x.reshape((4, nbt) + x.shape[1:]), batch_flat
            )
            return jax.lax.scan(mb_step, carry, mbs)

        (params, opt_state), m = jax.lax.scan(epoch, (params, opt_state), None, length=4)
        return params, opt_state, m

    results["train_noshuffle"] = bench_fn(
        train_noshuffle, (s["params"], s["opt"], batch_t), iters, "train (no shuffle)"
    )

    # --- single policy fwd at rollout batch and minibatch batch
    results["fwd_rollout_batch"] = bench_fn(
        lambda p, o: policy.apply(p, o), (s["params"], s["obs"]), iters, f"policy fwd batch={N}"
    )
    mb_obs = flat01(traj.obs)[: nbatch // 4]
    results["fwd_minibatch"] = bench_fn(
        lambda p, o: policy.apply(p, o), (s["params"], mb_obs), iters, f"policy fwd batch={nbatch // 4}"
    )

    # --- env-only scan (no policy in the loop)
    def env_only(key, env_state, obs):
        def body(carry, _):
            key, env_state, obs = carry
            key, kstep = jax.random.split(key)
            action = jnp.zeros((N,), jnp.int32)
            nobs, nstate, rew, ndone, _ = venv.step(kstep, env_state, action)
            return (key, nstate, nobs), rew
        carry, rews = jax.lax.scan(body, (key, env_state, obs), None, length=T)
        return carry, rews

    results["env_scan"] = bench_fn(
        env_only, (s["key"], s["env_state"], s["obs"]), iters, "env-only scan"
    )

    fps = N * T / results["full_update"]
    print(f"\nfull update: {results['full_update'] * 1e3:.2f} ms -> {fps:,.0f} env-steps/s", file=sys.stderr)
    acct = results["rollout"] + results["gae"] + results["train_epochs"]
    print(
        f"rollout {results['rollout'] * 1e3:.1f} + gae {results['gae'] * 1e3:.2f} + "
        f"train {results['train_epochs'] * 1e3:.1f} = {acct * 1e3:.1f} ms accounted "
        f"({100 * acct / results['full_update']:.0f}% of full)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
