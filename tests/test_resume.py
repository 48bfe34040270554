"""Auto-resume with progress for ppo2/trpo long runs (VERDICT r2 #8).

Emulates a mid-run kill: run uninterrupted to completion recording the
final params, then restart from an intermediate periodic checkpoint in a
fresh logdir and verify the resumed run reproduces the uninterrupted final
params bitwise (full state incl. RNG key and schedule progress is
checkpointed, so the two trajectories are identical).  Mirrors
deepq/deepq.py:244-257's resume semantics, extended to the on-policy
learners.
"""

import os
import shutil

import jax
import numpy as np
import pytest

from baselines_tpu.core import logger


@pytest.fixture(autouse=True)
def quiet_logger():
    yield
    logger.reset()


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(jax.device_get(tree))]


def _run(learn, tmp_path, tag, resume_from=None, **kwargs):
    logdir = str(tmp_path / tag)
    if resume_from is not None:
        os.makedirs(os.path.join(logdir, "checkpoints"), exist_ok=True)
        shutil.copy(
            resume_from,
            os.path.join(logdir, "checkpoints", os.path.basename(resume_from)),
        )
    logger.configure(dir=logdir, format_strs=[])
    model = learn(**kwargs)
    logger.reset()
    return model, logdir


def test_ppo_resume_reproduces_uninterrupted_run(tmp_path):
    from baselines_tpu.algos.ppo import ppo

    kwargs = dict(
        env_id="CartPole-v1", network="mlp", total_timesteps=4 * 8 * 64,
        seed=0, num_envs=8, nsteps=64, nminibatches=2, noptepochs=2,
        save_interval=1, log_interval=100,
    )
    full, logdir = _run(ppo.learn, tmp_path, "full", **kwargs)
    ckpt2 = os.path.join(logdir, "checkpoints", "00002")
    assert os.path.exists(ckpt2), "periodic checkpoints missing"

    resumed, rdir = _run(ppo.learn, tmp_path, "resumed", resume_from=ckpt2, **kwargs)
    assert int(resumed.state.update_idx) == 4
    for a, b in zip(_leaves(full.state.params), _leaves(resumed.state.params)):
        np.testing.assert_array_equal(a, b)


def test_trpo_resume_reproduces_uninterrupted_run(tmp_path):
    from baselines_tpu.algos.trpo import trpo

    kwargs = dict(
        env_id="CartPole-v1", network="mlp", total_timesteps=4 * 512,
        seed=0, num_envs=8, timesteps_per_batch=512,
        save_interval=1, log_interval=0,
    )
    full, logdir = _run(trpo.learn, tmp_path, "full", **kwargs)
    ckpt2 = os.path.join(logdir, "checkpoints", "00002")
    assert os.path.exists(ckpt2), "periodic checkpoints missing"

    resumed, rdir = _run(trpo.learn, tmp_path, "resumed", resume_from=ckpt2, **kwargs)
    assert int(resumed.state.iters) == 4
    for a, b in zip(_leaves(full.state.params), _leaves(resumed.state.params)):
        np.testing.assert_array_equal(a, b)


def test_explicit_load_path_beats_auto_resume(tmp_path):
    """ADVICE r3: a user's --load_path must not be overridden by stale
    checkpoints/ lying in the log dir from a prior run."""
    from baselines_tpu.algos.ppo import ppo

    kwargs = dict(
        env_id="CartPole-v1", network="mlp", total_timesteps=2 * 8 * 64,
        seed=0, num_envs=8, nsteps=64, nminibatches=2, noptepochs=2,
        save_interval=1, log_interval=100,
    )
    # a prior run leaves checkpoints in the log dir
    _, logdir = _run(ppo.learn, tmp_path, "prior", **kwargs)
    stale = os.path.join(logdir, "checkpoints", "00002")
    assert os.path.exists(stale)
    # save an explicit model checkpoint from a DIFFERENT seed
    other, _ = _run(ppo.learn, tmp_path, "other", **{**kwargs, "seed": 1, "save_interval": 0})
    explicit = str(tmp_path / "explicit.ckpt")
    other.save(explicit)

    # run with BOTH a stale-checkpoint log dir and an explicit load_path:
    # training must start from the explicit checkpoint at update 0, not
    # resume the stale one at update 2
    logger.configure(dir=logdir, format_strs=[])
    resumed = ppo.learn(load_path=explicit, **{**kwargs, "total_timesteps": 0})
    logger.reset()
    assert int(resumed.state.update_idx) == 0
    for a, b in zip(_leaves(other.state.params), _leaves(resumed.state.params)):
        np.testing.assert_array_equal(a, b)
