"""Deterministic evaluation of a GAIL checkpoint over many episodes.

`--play` evaluates 1 env x 2000 steps = 2 deterministic episodes, which
round 4's results flagged as noisy (results/gail_weak/RESULTS.md seed-2
caveat).  This evaluates 8 envs x 2000 steps = 16 episodes through the
SAME model/build path as `run.py --play` (learn(total_timesteps=0,
load_path=...) + algos.common.evaluate, raw-obs env — gail models carry
no VecNormalize statistics, the in-policy obfilter rides in .params).

Usage: JAX_PLATFORMS=cpu python scripts/gail_det_eval.py \
    --ckpt results/gail_ref_calib/gail-scratch-s0/model.ckpt \
    --expert results/gail_ref_calib/expert_ref_regime.npz
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--expert", required=True)
    p.add_argument("--env", default="HalfCheetah-v4")
    p.add_argument("--num_envs", type=int, default=8)
    p.add_argument("--nsteps", type=int, default=2000)
    args = p.parse_args()

    from baselines_tpu.algos.common import build_env, evaluate
    from baselines_tpu.algos.gail.gail import learn
    from baselines_tpu.core import logger

    logger.configure(format_strs=[])
    model = learn(env_id=args.env, total_timesteps=0, seed=0,
                  expert_path=args.expert, load_path=args.ckpt)
    venv = build_env(args.env, num_envs=args.num_envs, normalize=False)
    ret, length, episodes = evaluate(
        model, venv, jax.random.PRNGKey(0), nsteps=args.nsteps, deterministic=True
    )
    print(f"{args.ckpt}: deterministic return {ret:.1f} over {episodes} episodes (len {length:.0f})")


if __name__ == "__main__":
    main()
