"""CLI smoke tests (reference: common/tests/util.py:81-92 smoketest shells
out to baselines.run with tiny num_timesteps; test_doc_examples analog)."""

import sys

import pytest

from baselines_tpu import algos
from baselines_tpu.cmd_util import parse_cmdline_kwargs
from baselines_tpu.core import logger
from baselines_tpu.envs.registry import get_env_type


@pytest.fixture(autouse=True)
def quiet_logger():
    logger.configure(format_strs=[])
    yield
    logger.reset()


def test_parse_cmdline_kwargs():
    got = parse_cmdline_kwargs(["--lr=3e-4", "--nsteps", "64", "--name=foo", "--flag=True"])
    assert got == {"lr": 3e-4, "nsteps": 64, "name": "foo", "flag": True}


def test_env_type_detection():
    assert get_env_type("CartPole-v1") == "classic_control"
    assert get_env_type("PongNoFrameskip-v4") == "atari"
    assert get_env_type("HalfCheetah-v4") == "mujoco"
    assert get_env_type("FetchReach-v1") == "robotics"
    assert get_env_type("PointReach-v0") == "robotics"


def test_algo_registry():
    for alg in ["ppo2", "deepq", "a2c", "trpo_mpi", "ddpg", "her", "acktr", "acer", "gail"]:
        assert callable(algos.get_learn_function(alg))
    assert isinstance(algos.get_defaults("ppo2", "atari"), dict)
    assert algos.get_defaults("ppo2", "atari")["nsteps"] == 128


@pytest.mark.parametrize(
    "argv",
    [
        ["--alg=ppo2", "--env=CartPole-v1", "--num_timesteps=2048",
         "--nsteps=32", "--num_env=4", "--log_interval=1000"],
        ["--alg=a2c", "--env=CartPole-v1", "--num_timesteps=1000",
         "--num_env=4", "--log_interval=1000"],
        ["--alg=deepq", "--env=CartPole-v1", "--num_timesteps=1024",
         "--chunk_size=64", "--learning_starts=100", "--print_freq=0"],
        ["--alg=ppo2", "--env=native:CartPole-v1", "--num_timesteps=512",
         "--nsteps=32", "--num_env=4", "--log_interval=1000"],
    ],
)
def test_run_smoke(argv):
    from baselines_tpu.run import main

    model = main(argv)
    assert model is not None


def test_play_normalization_follows_model_stats(monkeypatch):
    """--play builds the eval env normalized ONLY when the model carries
    trained VecNormalize statistics (run.py play branch).  The raw-obs
    branch is load-bearing for every --play-derived GAIL number: a raw-obs
    policy fed cold-statistics-normalized observations scores garbage
    (a 4262-score model evaluated at -983 before the fix)."""
    import baselines_tpu.run as run_mod

    calls = []
    real_build_env = run_mod.build_env

    def recording_build_env(*a, **kw):
        calls.append(kw)
        return real_build_env(*a, **kw)

    monkeypatch.setattr(run_mod, "build_env", recording_build_env)

    # raw-obs model: classic control trains WITHOUT VecNormalize
    run_mod.main([
        "--alg=ppo2", "--env=CartPole-v1", "--num_timesteps=128",
        "--nsteps=32", "--num_env=4", "--nminibatches=2", "--noptepochs=1",
        "--log_interval=1000", "--play",
    ])
    assert calls, "--play never reached build_env"
    assert calls[-1]["normalize"] is False

    calls.clear()
    # VecNormalize-trained model: mujoco env_type normalizes by default
    run_mod.main([
        "--alg=ppo2", "--env=Reacher-v4", "--num_timesteps=128",
        "--nsteps=32", "--num_env=4", "--nminibatches=2", "--noptepochs=1",
        "--log_interval=1000", "--play",
    ])
    assert calls
    assert calls[-1]["normalize"] is True


def test_explicit_network_flag_beats_alg_defaults(monkeypatch):
    """run.py: an explicit --network must override per-algorithm defaults
    (reference run.py:92-95) — acer's testing default (mlp) used to win
    over a requested cnn, which then tripped the --s2d network check."""
    import baselines_tpu.run as run_mod

    captured = {}

    def fake_learn(**kw):
        captured.update(kw)
        return object()

    monkeypatch.setattr(
        run_mod.algos, "get_learn_function", lambda alg: fake_learn
    )
    run_mod.main([
        "--alg=acer", "--env=AtariSim-v0", "--network=cnn", "--s2d=4",
        "--num_timesteps=0",
    ])
    assert captured["network"] == "cnn_s2d"  # flag won; s2d mapped cnn->cnn_s2d
