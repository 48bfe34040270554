from baselines_tpu.envs.spaces import Box, Discrete, MultiBinary, MultiDiscrete, Space
from baselines_tpu.envs.base import JaxEnv
from baselines_tpu.envs.vec import VecJaxEnv, EpisodeStats
from baselines_tpu.envs.registry import make_env, register_env, env_names

__all__ = [
    "Box",
    "Discrete",
    "MultiBinary",
    "MultiDiscrete",
    "Space",
    "JaxEnv",
    "VecJaxEnv",
    "EpisodeStats",
    "make_env",
    "register_env",
    "env_names",
]
