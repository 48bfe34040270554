"""TPU kernels for hot ops that XLA's default lowering leaves bandwidth on
the table for (pallas_guide.md patterns; measured in scripts/profile_*.py)."""

from baselines_tpu.ops.gather import take_rows  # noqa: F401
