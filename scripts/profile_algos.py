"""Per-algorithm on-chip throughput table (VERDICT r4 item 10).

Drives each learner through the real CLI on the attached TPU, then
recovers STEADY-STATE env-steps/s from the run's own log: every learner
logs cumulative fps_i = steps_i / elapsed_i, so elapsed_i = steps_i/fps_i
and the steady rate between two late rows is
(steps_b - steps_a) / (elapsed_b - elapsed_a) — compile time and warmup
cancel out.  Rows a and b are taken at ~50% and 100% of the run.

Output: results/perf/ALGO_THROUGHPUT.md
"""

from __future__ import annotations

import csv
import os
import os.path as osp
import subprocess
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))

ONLY = set(sys.argv[1:])

# fps_mode: "cum" = the logged fps is cumulative steps/elapsed (invert to
# recover elapsed and difference two late rows); "interval" = the logged
# fps is already interval-accurate (median of the last half of rows).
RUNS = [
    # (alg, steps-col, fps-col, fps_mode, argv)
    ("a2c", "total_timesteps", "fps", "cum", [
        "--alg=a2c", "--env=AtariSim-v0", "--num_timesteps=6e6",
        "--num_env=256", "--s2d=4", "--network=cnn", "--dtype=bfloat16",
        "--seed=0", "--log_interval=500",
    ]),
    ("acer", "total_timesteps", "fps", "cum", [
        "--alg=acer", "--env=AtariSim-v0", "--num_timesteps=2e6",
        "--num_env=64", "--s2d=4", "--network=cnn", "--dtype=bfloat16",
        "--seed=0", "--buffer_size=50000", "--replay_start=10000",
        "--log_interval=100",
    ]),
    ("trpo_mpi", "timesteps", "fps", "cum", [
        "--alg=trpo_mpi", "--env=Pendulum-v1", "--num_timesteps=4e6",
        "--num_env=256", "--timesteps_per_batch=8192", "--network=mlp",
        "--seed=0", "--log_interval=10",
    ]),
    ("ddpg", "total/steps", "total/steps_per_second", "cum", [
        "--alg=ddpg", "--env=Pendulum-v1", "--num_timesteps=5e6",
        "--num_env=256", "--network=mlp", "--seed=0",
    ]),
    ("her", "total/steps", "steps_per_second", "cum", [
        "--alg=her", "--env=PointReach-v0", "--num_timesteps=2e6",
        "--num_env=64", "--network=mlp", "--seed=0", "--log_interval=1",
    ]),
    ("acktr", "total_timesteps", "fps", "cum", [
        "--alg=acktr", "--env=AtariSim-v0", "--num_timesteps=2e6",
        "--num_env=64", "--s2d=4", "--network=cnn", "--dtype=bfloat16",
        "--seed=0", "--log_interval=50", "--kfac_update=10",
        # kfac_update=10 = the atari default (AtariSim resolves to the
        # 'testing' env_type, which would otherwise fall back to the
        # strictly-synchronous kfac_update=1)
    ]),
    ("ppo1", "misc/total_timesteps", "fps", "interval", [
        "--alg=ppo1", "--env=AtariSim-v0", "--num_timesteps=3e6",
        "--num_env=64", "--s2d=4", "--network=cnn", "--dtype=bfloat16",
        "--seed=0", "--log_interval=10",
    ]),
]


def steady_fps(csv_path, steps_col, fps_col, mode="cum"):
    rows = list(csv.DictReader(open(csv_path)))
    pts = []
    for r in rows:
        try:
            s, f = float(r[steps_col]), float(r[fps_col])
        except (KeyError, ValueError):
            continue
        if f > 0:
            pts.append((s, f))
    if len(pts) < 3:
        return None, len(pts)
    if mode == "interval":
        import statistics
        return statistics.median(f for _, f in pts[len(pts) // 2 :]), len(pts)
    (sa, fa), (sb, fb) = pts[len(pts) // 2], pts[-1]
    ta, tb = sa / fa, sb / fb
    if tb <= ta:
        return None, len(pts)
    return (sb - sa) / (tb - ta), len(pts)


def main():
    out_rows = []
    for alg, steps_col, fps_col, fps_mode, argv in RUNS:
        if ONLY and alg not in ONLY:
            continue
        logdir = f"/tmp/algo_prof/{alg}"
        os.makedirs(logdir, exist_ok=True)
        cmd = [sys.executable, "-m", "baselines_tpu.run", *argv,
               f"--log_path={logdir}"]
        print(f"[{alg}] {' '.join(argv)}", flush=True)
        r = subprocess.run(cmd, cwd=ROOT, timeout=1200,
                           capture_output=True, text=True)
        if r.returncode != 0:
            print(f"[{alg}] FAILED rc={r.returncode}\n{r.stderr[-2000:]}")
            out_rows.append((alg, None, "run failed"))
            continue
        fps, n = steady_fps(osp.join(logdir, "progress.csv"), steps_col, fps_col, fps_mode)
        shown = f"{round(fps):,}" if fps else "n/a"
        print(f"[{alg}] steady fps = {shown} ({n} log rows)", flush=True)
        out_rows.append((alg, fps, f"{n} rows"))
    for alg, fps, note in out_rows:
        print(alg, round(fps) if fps else None, note)


if __name__ == "__main__":
    main()
