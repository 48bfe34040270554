from baselines_tpu.algos.ppo1.ppo1 import learn  # noqa: F401
