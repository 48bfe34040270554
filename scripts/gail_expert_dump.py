"""Dump HalfCheetah expert trajectories from the committed Mujoco1M ppo2
checkpoint into the reference's expert-npz schema (VERDICT r3 item 5).

Schema parity: /root/reference/baselines/gail/dataset/mujoco_dset.py reads
obs (E, T, do) and acs (E, T, da); rets/lens ride along for reporting.

Fidelity notes:
- obs are RAW env observations (the discriminator has its own obs_rms,
  adversary.py parity), while the expert policy consumes them through the
  checkpoint's FROZEN VecNormalize statistics (the exact transform it
  trained under: clip ±10, eps 1e-8).
- acs are the EXECUTED actions (clipped to the Box bounds, as the env
  applies them and as gail.learn feeds generator actions to the
  discriminator).

Usage: JAX_PLATFORMS=cpu python scripts/gail_expert_dump.py \
    [--ckpt results/mujoco1m/ppo2-HalfCheetah-v4-s2/model.ckpt] \
    [--out results/gail/expert_halfcheetah.npz]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="results/mujoco1m/ppo2-HalfCheetah-v4-s2/model.ckpt")
    p.add_argument("--env", default="HalfCheetah-v4")
    p.add_argument("--out", default="results/gail/expert_halfcheetah.npz")
    p.add_argument("--num_envs", type=int, default=8)
    p.add_argument("--nsteps", type=int, default=2000)  # 2 episodes/env
    p.add_argument("--ep_len", type=int, default=1000)
    args = p.parse_args()

    from baselines_tpu.algos.common import build_env
    from baselines_tpu.algos.ppo.ppo import learn
    from baselines_tpu.core import logger

    logger.configure(format_strs=[])
    # template model with the checkpoint's params + VecNormalize statistics
    model = learn(
        env_id=args.env, network="mlp", total_timesteps=0, seed=0, num_envs=1,
        nsteps=8, nminibatches=1, value_network="copy", load_path=args.ckpt,
    )
    ns = model._normalize_state()
    assert ns is not None, "checkpoint carries no VecNormalize statistics"
    ob_rms = jax.device_get(ns.ob_rms)
    policy, params = model.policy, model.params

    venv = build_env(args.env, args.num_envs, normalize=False)
    lo = jnp.asarray(venv.action_space.low)
    hi = jnp.asarray(venv.action_space.high)

    @jax.jit
    def run(key):
        obs, env_state = venv.reset(key)

        def body(carry, _):
            key, env_state, obs = carry
            key, kstep = jax.random.split(key)
            obs_n = ob_rms.normalize(obs, clip=10.0, epsilon=1e-8)
            a, _, _ = policy.mode_step(params, obs_n, None, None)
            a = jnp.clip(a, lo, hi)
            nobs, nstate, rew, done, _ = venv.step(kstep, env_state, a)
            return (key, nstate, nobs), (obs, a, rew, done)

        _, out = jax.lax.scan(body, (key, env_state, obs), None, length=args.nsteps)
        return out

    obs_t, acs_t, rew_t, done_t = (np.asarray(jax.device_get(x)) for x in run(jax.random.PRNGKey(0)))
    T, N = obs_t.shape[:2]
    assert T % args.ep_len == 0, (T, args.ep_len)
    # fixed-length episodes (HalfCheetah has no early termination): verify
    # every done lands exactly on an episode boundary
    done_steps = np.nonzero(done_t.any(axis=1))[0]
    assert all((s + 1) % args.ep_len == 0 for s in done_steps), done_steps

    def by_episode(x):  # (T, N, ...) -> (N * T/ep_len, ep_len, ...)
        x = x.reshape(T // args.ep_len, args.ep_len, N, *x.shape[2:])
        x = np.moveaxis(x, 2, 0)
        return x.reshape(-1, args.ep_len, *x.shape[3:])

    obs_e, acs_e, rew_e = by_episode(obs_t), by_episode(acs_t), by_episode(rew_t)
    rets = rew_e.sum(axis=1)
    lens = np.full((rets.shape[0],), args.ep_len, np.int64)
    os.makedirs(osp.dirname(args.out), exist_ok=True)
    np.savez_compressed(
        args.out,
        obs=obs_e.astype(np.float32),
        acs=acs_e.astype(np.float32),
        rets=rets.astype(np.float32),
        lens=lens,
    )
    print(
        f"wrote {args.out}: {rets.shape[0]} trajectories x {args.ep_len} steps, "
        f"expert return mean {rets.mean():.1f} ± {rets.std():.1f} "
        f"(min {rets.min():.1f}, max {rets.max():.1f})"
    )


if __name__ == "__main__":
    main()
