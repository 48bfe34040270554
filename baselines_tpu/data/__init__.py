from baselines_tpu.data.gae import gae, nstep_returns, discount_with_dones
from baselines_tpu.data.replay import ReplayBuffer, ReplayState
from baselines_tpu.data.prioritized import PrioritizedReplayBuffer, PrioritizedState

__all__ = [
    "gae",
    "nstep_returns",
    "discount_with_dones",
    "ReplayBuffer",
    "ReplayState",
    "PrioritizedReplayBuffer",
    "PrioritizedState",
]
