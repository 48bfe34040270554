"""CLI entry point: ``python -m baselines_tpu.run --alg=ppo2 --env=CartPole-v1``.

Parity with baselines/run.py:202-250: env-type detection, per-alg defaults by
env type, free-form ``--key=value`` hyperparameter overrides, --save_path /
--load_path, and --play rollout after training.
"""

from __future__ import annotations

import os.path as osp
import sys

from baselines_tpu import algos
from baselines_tpu.algos.common import build_env, evaluate
from baselines_tpu.cmd_util import common_arg_parser, parse_cmdline_kwargs
from baselines_tpu.core import logger
from baselines_tpu.envs.registry import get_env_type, is_jax_env


def _default_network(env_type: str) -> str:
    """run.py:145-152: cnn for image envs, mlp otherwise."""
    return "cnn" if env_type in ("atari", "retro") else "mlp"


def train(args, extra_args):
    env_type = args.env_type or get_env_type(args.env)
    logger.log(f"env_type: {env_type}")
    total_timesteps = int(args.num_timesteps)

    learn = algos.get_learn_function(args.alg)
    alg_kwargs = dict(algos.get_defaults(args.alg, env_type))
    alg_kwargs.update(extra_args)
    if args.network:
        # an explicit --network beats per-alg defaults (ref run.py:92-95:
        # `if args.network: alg_kwargs['network'] = args.network`) — the
        # old setdefault let e.g. acer's testing default (mlp) override a
        # user-requested cnn
        alg_kwargs["network"] = args.network
    else:
        alg_kwargs.setdefault("network", _default_network(env_type))
    if args.num_env:
        alg_kwargs["num_env"] = args.num_env

    # num_env naming: learners take num_envs
    if "num_env" in alg_kwargs:
        alg_kwargs["num_envs"] = alg_kwargs.pop("num_env")

    # env-construction flags ride to the learner's build_env call
    # (--reward_scale ref cmd_util.py:43, video flags ref cmd_util.py:163-164,
    # --gamestate ref run.py:99-101)
    env_kwargs = dict(alg_kwargs.pop("env_kwargs", None) or {})
    # --s2d=4: TPU lane-aligned space-to-depth obs packing (envs/vec.py
    # VecS2D); the default image network switches to the weight-equivalent
    # cnn_s2d (nn/networks.py)
    s2d = int(alg_kwargs.pop("s2d", 0) or 0)
    if s2d:
        env_kwargs["s2d"] = s2d
        net = alg_kwargs.get("network")
        if net == "cnn":
            alg_kwargs["network"] = "cnn_s2d"
        elif net != "cnn_s2d":
            # any other conv net would stay shape-legal on the packed
            # 21x21x64 obs and silently train on semantically scrambled
            # input — only cnn_s2d's conv1 is weight-matched to the packing
            raise ValueError(
                f"--s2d only pairs with network=cnn/cnn_s2d, got {net!r}"
            )
    if args.reward_scale != 1.0:
        env_kwargs["reward_scale"] = args.reward_scale
    if args.save_video_interval:
        env_kwargs["save_video_interval"] = args.save_video_interval
        env_kwargs["save_video_length"] = args.save_video_length
    if args.gamestate:
        env_kwargs["gamestate"] = args.gamestate

    logger.log(f"Training {args.alg} on {args.env} with arguments \n{alg_kwargs}")

    model = learn(
        env_id=args.env,
        seed=args.seed,
        total_timesteps=total_timesteps,
        load_path=args.load_path,
        env_kwargs=env_kwargs or None,
        **alg_kwargs,
    )
    return model


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    arg_parser = common_arg_parser()
    args, unknown_args = arg_parser.parse_known_args(argv)
    extra_args = parse_cmdline_kwargs(unknown_args)

    import os

    import jax

    # honor JAX_PLATFORMS even when a site plugin (TPU runtime hook) already
    # forced a platform via jax.config at interpreter start — the env var is
    # the documented way to run the CLI on CPU for tests/dev
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    logger.configure_for_process(jax.process_index(), dir=args.log_path)

    model = train(args, extra_args)

    if args.save_path is not None and jax.process_index() == 0:
        save_path = osp.expanduser(args.save_path)
        model.save(save_path)
        logger.log(f"Saved model to {save_path}")

    if args.play:
        logger.log("Running trained model")
        # normalize the play env ONLY when the model carries trained
        # VecNormalize statistics (evaluate injects them); a model trained on
        # raw obs (e.g. gail, run.py:222-244 analog) must not be fed
        # cold-statistics-normalized observations
        has_norm = getattr(model, "_normalize_state", lambda: None)() is not None
        venv = build_env(
            args.env,
            num_envs=1,
            normalize=has_norm,
            frame_stack=int(extra_args.get("frame_stack", 0) or 0),
            s2d=int(extra_args.get("s2d", 0) or 0),
            keep_dict_obs=args.alg == "her",  # goal policies consume dict obs
        )
        ret, length, episodes = evaluate(
            model, venv, jax.random.PRNGKey(0), nsteps=2000, deterministic=True
        )
        logger.log(f"episode_rew mean={ret} len={length} episodes={episodes}")

    return model


if __name__ == "__main__":
    main()
