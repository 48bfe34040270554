from baselines_tpu.nn.distributions import (
    CategoricalPd,
    DiagGaussianPd,
    BernoulliPd,
    MultiCategoricalPd,
    make_pdtype,
)
from baselines_tpu.nn.networks import get_network, network_names
from baselines_tpu.nn.policy import PolicyValueNet, Policy, build_policy

__all__ = [
    "CategoricalPd",
    "DiagGaussianPd",
    "BernoulliPd",
    "MultiCategoricalPd",
    "make_pdtype",
    "get_network",
    "network_names",
    "PolicyValueNet",
    "Policy",
    "build_policy",
]
