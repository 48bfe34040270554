"""Behavior cloning from the committed expert npz, evaluated deterministically
(the reference's BC imitator protocol, gail/behavior_clone.py +
gail/result/gail-result.md "BC imitators trained with seed 0").

Writes results/gail/BC_RESULTS.md.

Usage: JAX_PLATFORMS=cpu python scripts/gail_bc_eval.py
"""

from __future__ import annotations

import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import numpy as np


def main():
    from baselines_tpu.algos.common import Model, build_env, evaluate
    from baselines_tpu.algos.gail.behavior_clone import pretrain_bc
    from baselines_tpu.algos.gail.dataset import ExpertDataset
    from baselines_tpu.core import logger
    from baselines_tpu.nn.policy import build_policy

    logger.configure(format_strs=[])
    path = "results/gail/expert_halfcheetah.npz"
    ds = ExpertDataset(expert_path=path)
    expert_ret = float(np.load(path)["rets"].mean())

    venv = build_env("HalfCheetah-v4", 4, normalize=False)
    policy = build_policy(venv.observation_space, venv.action_space, "mlp",
                          value_network="copy")
    key = jax.random.PRNGKey(0)
    obs0, _ = venv.reset(key)
    params = policy.init(key, obs0)
    params = pretrain_bc(policy, params, ds, jax.random.PRNGKey(1), max_iters=10000)

    class _S:  # minimal state shell for Model
        pass

    s = _S()
    s.params, s.env_state = params, None
    ret, _, _ = evaluate(Model(policy, s), venv, jax.random.PRNGKey(2), nsteps=1000)
    ratio = ret / expert_ret
    os.makedirs("results/gail", exist_ok=True)
    with open("results/gail/BC_RESULTS.md", "w") as f:
        f.write(
            "# Behavior cloning on the HalfCheetah expert dataset\n\n"
            "10k Adam iterations of MSE action regression on "
            f"`expert_halfcheetah.npz` (16 x 1000 transitions), raw obs,\n"
            "deterministic evaluation over 1000 steps x 4 envs "
            "(scripts/gail_bc_eval.py, seed 0):\n\n"
            f"| expert (deterministic) | BC imitator | ratio |\n|---|---|---|\n"
            f"| {expert_ret:.1f} | {float(ret):.1f} | {ratio:.2f}x |\n\n"
            "Reference calibration: the reference's own BC imitator reaches\n"
            "~0.82x of its (much weaker, ~895-score) HalfCheetah-v1 expert\n"
            "with 50 trajectories (gail/result/gail-result.md).\n"
        )
    print(f"expert {expert_ret:.1f}, BC {float(ret):.1f} ({ratio:.2f}x); wrote results/gail/BC_RESULTS.md")


if __name__ == "__main__":
    main()
