from baselines_tpu.envs.testing.identity import (
    BoxIdentityEnv,
    DiscreteIdentityEnv,
    MultiDiscreteIdentityEnv,
)
from baselines_tpu.envs.testing.fixed_sequence import FixedSequenceEnv
from baselines_tpu.envs.testing.simple import SimpleDeterministicEnv

__all__ = [
    "BoxIdentityEnv",
    "DiscreteIdentityEnv",
    "MultiDiscreteIdentityEnv",
    "FixedSequenceEnv",
    "SimpleDeterministicEnv",
]
