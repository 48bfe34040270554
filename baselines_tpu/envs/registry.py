"""Environment registry and factory.

Routing analog of baselines/run.py:121-145 (env-type detection from the gym
registry) + cmd_util.make_vec_env/make_env (cmd_util.py:22-105).  Pure-JAX
envs are first-class; gymnasium-backed host envs (MuJoCo etc.) are served by
envs/gym_bridge.py and selected automatically when an id isn't JAX-native.
"""

from __future__ import annotations

from typing import Callable, Tuple

from baselines_tpu.core.registry import Registry
from baselines_tpu.envs.base import JaxEnv

_ENVS: Registry[Callable[[], JaxEnv]] = Registry("env")
_ENV_TYPES = {}


def register_env(env_id: str, env_type: str = "classic_control"):
    _ENV_TYPES[env_id] = env_type
    return _ENVS.register(env_id)


def env_names():
    return _ENVS.names()


def is_jax_env(env_id: str) -> bool:
    return env_id in _ENVS


def get_env_type(env_id: str) -> str:
    """classic_control / mujoco / atari / testing / robotics — the env_type
    keying per-alg defaults (run.py:121-145, ppo2/defaults.py)."""
    if env_id.startswith("native:"):
        env_id = env_id.split(":", 1)[1]
    if env_id in _ENV_TYPES:
        return _ENV_TYPES[env_id]
    lid = env_id.lower()
    if "noframeskip" in lid or "ale/" in lid:
        return "atari"
    for name in ("halfcheetah", "hopper", "walker", "ant", "humanoid", "swimmer",
                 "reacher", "invertedpendulum", "inverteddoublependulum", "pusher"):
        if lid.startswith(name):
            return "mujoco"
    if lid.startswith("fetch") or lid.startswith("hand"):
        return "robotics"
    return "classic_control"


def make_env(env_id: str) -> JaxEnv:
    """Instantiate a single (unvectorized) pure-JAX env by id."""
    return _ENVS.get(env_id)()


# --- registrations -----------------------------------------------------------

from baselines_tpu.envs.classic.cartpole import make_cartpole
from baselines_tpu.envs.classic.pendulum import make_pendulum
from baselines_tpu.envs.classic.mountain_car import (
    make_mountain_car,
    make_mountain_car_continuous,
)
from baselines_tpu.envs.classic.acrobot import make_acrobot
from baselines_tpu.envs.goal.point_reach import make_point_reach
from baselines_tpu.envs.testing.identity import (
    BoxIdentityEnv,
    DiscreteIdentityEnv,
    ImageIdentityEnv,
    MultiDiscreteIdentityEnv,
)
from baselines_tpu.envs.testing.fixed_sequence import (
    FixedSequenceEnv,
    ImageFixedSequenceEnv,
)

register_env("CartPole-v0")(lambda: make_cartpole(0))
register_env("CartPole-v1")(lambda: make_cartpole(1))
register_env("Pendulum-v1")(make_pendulum)
register_env("MountainCar-v0")(make_mountain_car)
register_env("MountainCarContinuous-v0")(make_mountain_car_continuous)
register_env("Acrobot-v1")(make_acrobot)
register_env("PointReach-v0", "robotics")(make_point_reach)
register_env("DiscreteIdentity-v0", "testing")(lambda: DiscreteIdentityEnv(10))
register_env("BoxIdentity-v0", "testing")(lambda: BoxIdentityEnv((1,)))
register_env("MultiDiscreteIdentity-v0", "testing")(
    lambda: MultiDiscreteIdentityEnv((3, 3))
)
register_env("ImageIdentity-v0", "testing")(lambda: ImageIdentityEnv())
# 36x36 variant: the smallest square frame the full Nature CNN's conv
# ladder (8/4, 4/2, 3/1 VALID) accepts — for dqn/acer CNN learning tests
register_env("ImageIdentity36-v0", "testing")(lambda: ImageIdentityEnv(size=36))
register_env("FixedSequence-v0", "testing")(lambda: FixedSequenceEnv())
# seed=3 draws an all-distinct action sequence, so the best memoryless
# policy scores 1 of 4 and only recurrent policies can reach 4 of 4
register_env("ImageFixedSequence-v0", "testing")(lambda: ImageFixedSequenceEnv(seed=3))

from baselines_tpu.envs.testing.atari_sim import AtariSim

register_env("AtariSim-v0", "testing")(lambda: AtariSim())
