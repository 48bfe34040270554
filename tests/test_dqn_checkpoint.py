"""deepq checkpoint machinery (deepq/deepq.py:244-331 analog):
periodic `latest` snapshots with auto-resume, best-by-mean-100ep-reward
`best` snapshots, and restore-best (not last) at the end of training."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from baselines_tpu.algos.dqn.dqn import learn
from baselines_tpu.core import logger


def _quiet():
    logger.configure(format_strs=[])


def _run(tmpdir, total, **kw):
    return learn(
        env_id="CartPole-v1",
        network="mlp",
        seed=0,
        num_envs=8,
        total_timesteps=total,
        learning_starts=128,
        chunk_size=32,
        checkpoint_freq=512,
        checkpoint_path=str(tmpdir),
        print_freq=None,
        **kw,
    )


def test_latest_written_and_resumed(tmp_path):
    _quiet()
    cp = tmp_path / "ckpt"
    m1 = _run(cp, total=2048)
    assert (cp / "latest").exists()
    t1 = int(m1.state.t)
    assert t1 >= 2048

    # second invocation resumes training progress from `latest`: the
    # exploration/target schedules continue from t1 instead of restarting
    m2 = _run(cp, total=2048)
    assert int(m2.state.t) >= t1 + 2048


def test_best_restored_at_end_not_last(tmp_path):
    _quiet()
    cp = tmp_path / "ckpt"
    _run(cp, total=2048)

    # plant a `best` checkpoint with recognizable params and an unbeatable
    # recorded mean reward; a subsequent run must return THESE params even
    # though its own final (last) params differ (deepq.py:327-331)
    with open(cp / "latest", "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    raw["params"] = jax.tree_util.tree_map(np.zeros_like, raw["params"])
    raw["best_mean_reward"] = 1e9
    with open(cp / "best", "wb") as f:
        f.write(serialization.msgpack_serialize(raw))

    m = _run(cp, total=1024)
    leaves = jax.tree_util.tree_leaves(m.params)
    assert all(float(jnp.max(jnp.abs(l))) == 0.0 for l in leaves)
