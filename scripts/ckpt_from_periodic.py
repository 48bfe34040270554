"""Convert a periodic (full-train-state) ppo2 checkpoint into the
--save_path payload (params + VecNormalize stats), so any intermediate
checkpoint of a run can be evaluated / dumped as an expert.

The reference's GAIL calibration uses an expert in the ~895-score regime
(gail/result/gail-result.md, HalfCheetah-unnormalized-deterministic);
HalfCheetah training jumps from ~300 straight past 1400 between whole-run
budgets, so the only way to land an expert in that band is to pick it out
of ONE run's periodic checkpoints (ppo2 save_interval, the analog of
ppo2/ppo2.py:211-216 checkpoints).

Usage: JAX_PLATFORMS=cpu python scripts/ckpt_from_periodic.py \
    --periodic results/gail_ref_calib/exp_ckpts/checkpoints/00060 \
    --out /tmp/expert60.ckpt [--env HalfCheetah-v4]
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
    p.add_argument("--periodic", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--env", default="HalfCheetah-v4")
    args = p.parse_args()

    from baselines_tpu.algos.ppo.ppo import learn
    from baselines_tpu.core import logger

    logger.configure(format_strs=[])
    # template with the training run's default mujoco config (the periodic
    # payload is the FULL state, so the template structure must match)
    model = learn(env_id=args.env, network="mlp", total_timesteps=0, seed=0,
                  value_network="copy")
    model.load_full(args.periodic)
    model.save(args.out)
    print(f"wrote {args.out} (update {int(model.state.update_idx)})")


if __name__ == "__main__":
    main()
