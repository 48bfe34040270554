"""Misc helpers — capability parity with baselines/common/misc_util.py
(global seeding :45-58, paired boolean argparse flags :61-73,
constructor-arg pickling :76-108, human-readable ETA :111-145)."""

from __future__ import annotations

import random

import numpy as np


def set_global_seeds(i):
    """Seed python/numpy global RNGs.  JAX randomness flows through explicit
    keys (core/rng.py), which this cannot and need not touch."""
    if i is None:
        return
    random.seed(i)
    np.random.seed(i % 2**32)


def boolean_flag(parser, name, default=False, help=None):
    """Register ``--name`` / ``--no-name`` toggles on an ArgumentParser."""
    dest = name.replace("-", "_")
    parser.add_argument(f"--{name}", dest=dest, action="store_true", default=default, help=help)
    parser.add_argument(f"--no-{name}", dest=dest, action="store_false")


class EzPickle:
    """Pickle an object as (constructor args) and rebuild by re-calling
    ``__init__`` on load — for objects holding unpicklable state that is
    derivable from their constructor arguments."""

    def __init__(self, *args, **kwargs):
        self._ctor_args = (args, kwargs)

    def __getstate__(self):
        return {"ctor": self._ctor_args}

    def __setstate__(self, state):
        args, kwargs = state["ctor"]
        rebuilt = type(self)(*args, **kwargs)
        self.__dict__.update(rebuilt.__dict__)


def pretty_eta(seconds_left):
    """'2 days and 3 hours' style remaining-time string; the two largest
    nonzero units are shown, '<1 minute' floors the scale."""
    seconds_left = int(seconds_left)
    units = []
    for name, size in (("day", 86400), ("hour", 3600), ("minute", 60)):
        count, seconds_left = divmod(seconds_left, size)
        units.append((name, count))
    parts = [f"{c} {n}{'s' if c > 1 else ''}" for n, c in units if c > 0]
    if not parts:
        return "less than a minute"
    return " and ".join(parts[:2])
