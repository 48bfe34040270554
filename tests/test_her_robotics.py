"""HER robotics surface (VERDICT r1 item 9): FetchReach through the host
dict-obs bridge, the evaluator pipeline, params.json, and the dict-obs
wrappers (VecExtractDictObs / VecFlattenDictObs)."""

import json
import os.path as osp

import jax
import numpy as np
import pytest

from baselines_tpu.core import logger


def test_her_fetchreach_learns(tmp_path):
    pytest.importorskip("gymnasium_robotics")
    from baselines_tpu.algos.her.her import learn

    logger.configure(dir=str(tmp_path), format_strs=["csv"])
    model = learn(
        env_id="FetchReach-v4",
        total_timesteps=32000,
        seed=0,
        num_envs=4,
        n_test_rollouts=10,
        log_interval=1,
    )
    # the reference gate: >= 0.9 success on FetchReach
    # (common/tests/test_fetchreach.py:20-40); measured 1.0 over the last
    # 8 epochs at this budget (VERDICT r2 #7)
    rows = open(tmp_path / "progress.csv").read().splitlines()
    header = rows[0].split(",")
    idx = header.index("test/success_rate")
    final = float(rows[-1].split(",")[idx])
    assert final >= 0.9, final
    # params.json dump (her/experiment/config.py log_params analog)
    params = json.load(open(tmp_path / "params.json"))
    assert params["env_id"] == "FetchReach-v4"
    assert params["n_cycles"] == 10  # DEFAULT_ENV_PARAMS FetchReach override
    # goal-conditioned model surface works on dict obs
    a, *_ = model.policy.mode_step(
        model.params,
        {
            "observation": np.zeros((1, 10), np.float32),
            "desired_goal": np.zeros((1, 3), np.float32),
        },
    )
    assert a.shape == (1, 4)


def test_dict_obs_wrappers():
    pytest.importorskip("gymnasium_robotics")
    from baselines_tpu.algos.common import build_env
    from baselines_tpu.envs.spaces import DictSpace
    from baselines_tpu.envs.vec import VecExtractDictObs

    # default: flattened obs ++ desired_goal Box (make_robotics_env contract)
    venv = build_env("FetchReach-v4", 2, normalize=False)
    assert venv.observation_space.shape == (13,)  # 10 obs + 3 goal
    obs, state = venv.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 13)
    obs, state, rew, done, info = venv.step(
        jax.random.PRNGKey(1), state, np.zeros((2, 4), np.float32)
    )
    assert obs.shape == (2, 13) and info["terminal_obs"].shape == (2, 13)
    venv.close()

    # keep_dict_obs exposes the raw DictSpace; VecExtractDictObs projects
    venv = build_env("FetchReach-v4", 2, normalize=False, keep_dict_obs=True)
    base = venv.venv  # under VecMonitor
    assert isinstance(base.observation_space, DictSpace)
    ext = VecExtractDictObs(base, "observation")
    obs, state = ext.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 10)
    obs, state, rew, done, info = ext.step(
        jax.random.PRNGKey(1), state, np.zeros((2, 4), np.float32)
    )
    assert obs.shape == (2, 10) and info["terminal_obs"].shape == (2, 10)
    venv.close()
