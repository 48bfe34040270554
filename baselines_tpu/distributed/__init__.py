from baselines_tpu.distributed.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    DATA_AXIS,
)
from baselines_tpu.distributed.collectives import (
    psum,
    pmean,
    param_consistency_check,
    host_weighted_mean,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "DATA_AXIS",
    "psum",
    "pmean",
    "param_consistency_check",
    "host_weighted_mean",
]
