"""Whole-train-state checkpointing.

The reference saves a dict of {var.name: ndarray} via joblib
(baselines/common/tf_util.py:345-372) and has per-algorithm ad-hoc pickles
(deepq ActWrapper deepq/deepq.py:23-92, her __getstate__ her/ddpg.py:418-444);
VecNormalize statistics are lost unless use_tf=True (README.md:117).

Here one mechanism checkpoints the ENTIRE train-state pytree — params, opt
state, normalizer statistics, replay buffer (optional), env state, RNG — via
flax.serialization msgpack, fixing the normalizer-statistics wart by
construction.  Layout: <path> is a single file; periodic checkpoints go to
<dir>/checkpoints/<step:05d> like ppo2 (ppo2/ppo2.py:211-216).
"""

from __future__ import annotations

import os
import os.path as osp

import jax
import numpy as np
from flax import serialization


def save_state(path: str, state) -> None:
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))


def load_state(path: str, target):
    """Restore into a template pytree of the same structure (e.g. a freshly
    initialized train state)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_params(path: str, params) -> None:
    """Params-only save for --save_path compatibility (run.py:216-220)."""
    save_state(path, params)


def load_params(path: str, target):
    return load_state(path, target)


def periodic_path(logdir: str, step: int) -> str:
    d = osp.join(logdir, "checkpoints")
    os.makedirs(d, exist_ok=True)
    return osp.join(d, f"{step:05d}")


def latest_checkpoint(logdir: str) -> str | None:
    d = osp.join(logdir, "checkpoints")
    if not osp.isdir(d):
        return None
    names = [n for n in os.listdir(d) if n.isdigit()]
    if not names:
        return None
    return osp.join(d, max(names, key=int))
