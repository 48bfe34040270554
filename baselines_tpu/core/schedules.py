"""Jit-friendly annealing schedules.

Capability parity with baselines/common/schedules.py:1-99 (Constant /
Piecewise / Linear) and the fraction-style LR/cliprange annealing used by
ppo2 (baselines/ppo2/ppo2.py:133-137), rebuilt as pure functions of a traced
step scalar so they can live inside a jitted train step — the reference
evaluates schedules in Python on the host every iteration.
"""

from __future__ import annotations

import jax.numpy as jnp


class ConstantSchedule:
    """value(t) == v for all t (schedules.py:62-74 equivalent)."""

    def __init__(self, value: float):
        self._v = float(value)

    def value(self, t):
        return jnp.full((), self._v, dtype=jnp.float32) + 0.0 * jnp.asarray(t, jnp.float32)

    __call__ = value


class LinearSchedule:
    """Linear interpolation from initial_p to final_p over schedule_timesteps,
    then clamped (schedules.py:77-99 equivalent).  `t` may be traced."""

    def __init__(self, schedule_timesteps: int, final_p: float, initial_p: float = 1.0):
        self.schedule_timesteps = float(schedule_timesteps)
        self.final_p = float(final_p)
        self.initial_p = float(initial_p)

    def value(self, t):
        frac = jnp.clip(jnp.asarray(t, jnp.float32) / self.schedule_timesteps, 0.0, 1.0)
        return self.initial_p + frac * (self.final_p - self.initial_p)

    __call__ = value


class PiecewiseSchedule:
    """Piecewise-linear through (t, value) endpoints with outside-value clamp
    (schedules.py:19-59 equivalent), via jnp.interp so it traces cleanly."""

    def __init__(self, endpoints, outside_value=None):
        ts, vs = zip(*endpoints)
        if list(ts) != sorted(ts):
            raise ValueError("endpoints must be sorted by t")
        self._ts = jnp.asarray(ts, jnp.float32)
        self._vs = jnp.asarray(vs, jnp.float32)
        self._outside_value = outside_value

    def value(self, t):
        t = jnp.asarray(t, jnp.float32)
        v = jnp.interp(t, self._ts, self._vs)
        if self._outside_value is not None:
            outside = (t < self._ts[0]) | (t > self._ts[-1])
            v = jnp.where(outside, jnp.float32(self._outside_value), v)
        return v

    __call__ = value


def constant_fraction_schedule(value: float):
    """lr(frac_remaining) = value * frac_remaining, the ppo2 annealing contract
    (ppo2/ppo2.py:90-96 accepts both callables-of-fraction and constants)."""

    def f(frac):
        return jnp.float32(value) * jnp.asarray(frac, jnp.float32)

    return f


def resolve_fraction_schedule(value):
    """Accept a constant or a callable-of-remaining-fraction, mirroring
    ppo2/ppo2.py:90-96."""
    if callable(value):
        return value
    v = float(value)
    return lambda frac: jnp.full((), v, jnp.float32) + 0.0 * jnp.asarray(frac, jnp.float32)
