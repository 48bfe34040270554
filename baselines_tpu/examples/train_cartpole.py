"""DQN on CartPole — parity with
baselines/deepq/experiments/train_cartpole.py: train until solved, save the
model for enjoy_cartpole.py."""

from baselines_tpu.algos.dqn.dqn import learn
from baselines_tpu.core import logger


def main():
    logger.configure()
    model = learn(
        env_id="CartPole-v1",
        network="mlp",
        num_hidden=64,
        lr=1e-3,
        total_timesteps=100_000,
        num_envs=4,
        buffer_size=50000,
        exploration_fraction=0.1,
        exploration_final_eps=0.02,
        gamma=0.99,
        print_freq=10,
    )
    print("Saving model to cartpole_model.msgpack")
    model.save("cartpole_model.msgpack")


if __name__ == "__main__":
    main()
