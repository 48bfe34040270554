"""Algorithm registry — the analog of baselines/run.py:154-167's
import-by-name algorithm discovery."""

from importlib import import_module

_ALGOS = {
    "ppo2": "baselines_tpu.algos.ppo.ppo",
    "ppo": "baselines_tpu.algos.ppo.ppo",
    # first-gen PPO with pposgd_simple's update semantics (batch-level
    # advantage standardization, unclipped value MSE, lrmult-annealed clip)
    "ppo1": "baselines_tpu.algos.ppo1.ppo1",
    "deepq": "baselines_tpu.algos.dqn.dqn",
    "dqn": "baselines_tpu.algos.dqn.dqn",
    "a2c": "baselines_tpu.algos.a2c.a2c",
    "trpo_mpi": "baselines_tpu.algos.trpo.trpo",
    "trpo": "baselines_tpu.algos.trpo.trpo",
    "ddpg": "baselines_tpu.algos.ddpg.ddpg",
    "her": "baselines_tpu.algos.her.her",
    "acktr": "baselines_tpu.algos.acktr.acktr",
    "acer": "baselines_tpu.algos.acer.acer",
    "gail": "baselines_tpu.algos.gail.gail",
}


def algo_names():
    return sorted(set(_ALGOS))


def get_learn_function(alg: str):
    if alg not in _ALGOS:
        raise ValueError(f"unknown algorithm {alg!r}; known: {algo_names()}")
    return import_module(_ALGOS[alg]).learn


def get_defaults(alg: str, env_type: str) -> dict:
    """Per-alg, per-env-type kwargs (run.py:170-176 + <alg>/defaults.py)."""
    if alg not in _ALGOS:
        raise ValueError(f"unknown algorithm {alg!r}")
    mod_name = _ALGOS[alg].rsplit(".", 1)[0] + ".defaults"
    try:
        mod = import_module(mod_name)
    except ImportError:
        return {}
    fn = getattr(mod, env_type, None)
    return fn() if fn else {}
