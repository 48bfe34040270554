"""Watch a trained CartPole DQN — parity with
baselines/deepq/experiments/enjoy_cartpole.py (loads the saved model, rolls
episodes, prints rewards; writes a video instead of opening a window)."""

import jax

from baselines_tpu.algos.common import build_env, evaluate
from baselines_tpu.algos.dqn.dqn import learn


def main():
    # rebuild the model structure, then load weights
    model = learn(
        env_id="CartPole-v1",
        network="mlp",
        num_hidden=64,
        total_timesteps=0,
        num_envs=4,
        print_freq=0,
        load_path="cartpole_model.msgpack",
    )
    venv = build_env("CartPole-v1", 4)
    ret, length, episodes = evaluate(model, venv, jax.random.PRNGKey(0), nsteps=1000)
    print(f"mean episode reward {ret} over {episodes} episodes")

    from baselines_tpu.envs.registry import make_env
    from baselines_tpu.envs.video import record_video

    record_video(model, make_env("CartPole-v1"), "cartpole.mp4", video_length=300)


if __name__ == "__main__":
    main()
