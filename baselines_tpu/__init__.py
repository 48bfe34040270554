"""baselines_tpu — a TPU-native reinforcement-learning training framework.

A ground-up JAX/XLA/pjit/Pallas rebuild with the capabilities of
openai/baselines (reference: /root/reference).  The entire training loop —
batched environment rollout, advantage estimation, replay buffers, and
policy/value updates — lives on device under ``jax.jit``; data parallelism
is expressed as shardings over a ``jax.sharding.Mesh`` with XLA collectives
instead of MPI (reference: baselines/common/mpi_*.py).

Layout:
  core/         config, logging, schedules, running statistics, checkpointing
  distributed/  mesh construction + collective helpers (replaces MPI backend)
  envs/         pure-JAX environments + vectorized rollout engine + host bridge
  nn/           network zoo, action distributions, policy builder
  data/         GAE/returns scans, device-resident replay buffers
  algos/        ppo, dqn, a2c, trpo, ddpg, her, acktr, acer, gail
"""

__version__ = "0.1.0"
