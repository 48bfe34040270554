from baselines_tpu.core import math as math_util
from baselines_tpu.core.registry import Registry
from baselines_tpu.core.schedules import (
    ConstantSchedule,
    LinearSchedule,
    PiecewiseSchedule,
    constant_fraction_schedule,
)
from baselines_tpu.core.running_stats import RunningMeanStd
from baselines_tpu.core import logger

__all__ = [
    "math_util",
    "Registry",
    "ConstantSchedule",
    "LinearSchedule",
    "PiecewiseSchedule",
    "constant_fraction_schedule",
    "RunningMeanStd",
    "logger",
]
