"""Misc helpers — parity with baselines/common/misc_util.py
(set_global_seeds :45-58, boolean_flag :61-73, EzPickle :76-108,
pretty_eta / RunningAvg subset)."""

from __future__ import annotations

import random

import numpy as np


def set_global_seeds(i):
    """misc_util.py:45-58 — python/np seeding; jax randomness flows through
    explicit keys (core/rng.py), which this cannot and need not touch."""
    if i is None:
        return
    random.seed(i)
    np.random.seed(i % (2**32))


def boolean_flag(parser, name, default=False, help=None):
    """misc_util.py:61-73: --name / --no-name argparse pair."""
    dest = name.replace("-", "_")
    parser.add_argument(
        "--" + name, action="store_true", default=default, dest=dest, help=help
    )
    parser.add_argument("--no-" + name, action="store_false", dest=dest)


class EzPickle:
    """misc_util.py:76-108: pickle via constructor args."""

    def __init__(self, *args, **kwargs):
        self._ezpickle_args = args
        self._ezpickle_kwargs = kwargs

    def __getstate__(self):
        return {
            "_ezpickle_args": self._ezpickle_args,
            "_ezpickle_kwargs": self._ezpickle_kwargs,
        }

    def __setstate__(self, d):
        out = type(self)(*d["_ezpickle_args"], **d["_ezpickle_kwargs"])
        self.__dict__.update(out.__dict__)


def pretty_eta(seconds_left):
    """misc_util.py:111-145."""
    minutes_left = seconds_left // 60
    seconds_left %= 60
    hours_left = minutes_left // 60
    minutes_left %= 60
    days_left = hours_left // 24
    hours_left %= 24

    def helper(cnt, name):
        return f"{cnt} {name}{'s' if cnt > 1 else ''}"

    if days_left > 0:
        msg = helper(days_left, "day")
        if hours_left > 0:
            msg += " and " + helper(hours_left, "hour")
        return msg
    if hours_left > 0:
        msg = helper(hours_left, "hour")
        if minutes_left > 0:
            msg += " and " + helper(minutes_left, "minute")
        return msg
    if minutes_left > 0:
        return helper(minutes_left, "minute")
    return "less than a minute"
