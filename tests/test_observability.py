"""Observability tests (reference: bench/test_monitor.py:5-31 csv format,
test_plot_util.py smoke, test_video_recorder.py:16-47 mp4 output, logger
formats)."""

import glob
import json
import os.path as osp

import numpy as np
import pytest

from baselines_tpu.bench import monitor_io, plot_util
from baselines_tpu.bench.benchmarks import get_benchmark, list_benchmarks
from baselines_tpu.core import logger


def test_results_writer_and_loader(tmp_path):
    w = monitor_io.ResultsWriter(str(tmp_path / "run0"), header={"env_id": "TestEnv"})
    for i in range(10):
        w.write_row({"r": float(i), "l": 10 * i, "t": float(i)})
    w.close()
    df = monitor_io.load_results(str(tmp_path))
    assert len(df) == 10
    assert df.headers[0]["env_id"] == "TestEnv"
    assert df.r.iloc[-1] == 9.0
    # header line is a json comment
    fname = glob.glob(str(tmp_path / "*monitor.csv"))[0]
    first = open(fname).readline()
    assert first.startswith("#") and json.loads(first[1:])["env_id"] == "TestEnv"


def test_logger_formats(tmp_path):
    logger.configure(dir=str(tmp_path), format_strs=["csv", "json", "log"])
    logger.logkv("a", 1.0)
    logger.logkv_mean("b", 2.0)
    logger.logkv_mean("b", 4.0)
    logger.dumpkvs()
    logger.logkv("a", 5.0)
    logger.logkv("c", 7.0)  # new column → csv rewrite
    logger.dumpkvs()
    logger.reset()
    csv = open(tmp_path / "progress.csv").read().splitlines()
    assert csv[0].split(",") == ["a", "b", "c"]
    rows = [json.loads(l) for l in open(tmp_path / "progress.json")]
    assert rows[0]["b"] == 3.0  # logkv_mean averaged
    assert rows[1]["c"] == 7.0


def test_plot_util_ema_and_results(tmp_path):
    xs = np.linspace(0, 10, 100)
    ys = np.sin(xs)
    xn, yn, counts = plot_util.symmetric_ema(xs, ys, n=64)
    assert len(xn) == 64 and np.isfinite(yn).all()
    # build a fake run dir and load + plot
    d = tmp_path / "run-0"
    d.mkdir()
    w = monitor_io.ResultsWriter(str(d / "0"), header={"env_id": "X"})
    for i in range(120):
        w.write_row({"r": float(i % 30), "l": 5, "t": float(i)})
    w.close()
    results = plot_util.load_results(str(tmp_path))
    assert len(results) == 1
    f, axarr = plot_util.plot_results(results)
    assert axarr.shape == (1, 1)


def test_benchmark_registry():
    names = list_benchmarks()
    assert "Atari10M" in names and "Mujoco1M" in names
    b = get_benchmark("Atari10M")
    assert len(b["tasks"]) == 7
    assert b["tasks"][0]["num_timesteps"] == int(10e6)
    pong = [t for t in b["tasks"] if "Pong" in t["env_id"]]
    assert pong and pong[0]["trials"] == 6


def test_video_recorder(tmp_path, key):
    import jax

    from baselines_tpu.envs.registry import make_env
    from baselines_tpu.envs.video import record_video
    from baselines_tpu.nn import build_policy

    env = make_env("CartPole-v1")
    policy = build_policy(env.observation_space, env.action_space, "mlp")
    import jax.numpy as jnp

    params = policy.init(key, jnp.zeros((1, 4)))

    class _S:
        pass

    from baselines_tpu.algos.common import Model

    s = _S()
    s.params = params
    model = Model(policy, s)
    path = str(tmp_path / "video.mp4")
    record_video(model, env, path, video_length=30)
    assert osp.exists(path) and osp.getsize(path) > 1000
