from baselines_tpu.bench.benchmarks import (
    get_benchmark,
    list_benchmarks,
    register_benchmark,
)
from baselines_tpu.bench.monitor_io import ResultsWriter, load_results

__all__ = [
    "get_benchmark",
    "list_benchmarks",
    "register_benchmark",
    "ResultsWriter",
    "load_results",
]
