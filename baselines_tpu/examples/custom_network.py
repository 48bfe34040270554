"""Custom-network example — parity with
baselines/deepq/experiments/custom_cartpole.py: pass your own flax module
through the network registry instead of a zoo name."""

import flax.linen as nn
import jax.numpy as jnp

from baselines_tpu.algos.ppo.ppo import learn
from baselines_tpu.core import logger
from baselines_tpu.nn import networks


@networks.register("my_tiny_net")
class MyTinyNet(nn.Module):
    width: int = 32

    is_recurrent = False

    @nn.compact
    def __call__(self, x):
        h = x.astype(jnp.float32).reshape((x.shape[0], -1))
        h = nn.relu(nn.Dense(self.width)(h))
        return nn.relu(nn.Dense(self.width)(h))


def main():
    logger.configure()
    learn(
        env_id="CartPole-v1",
        network="my_tiny_net",
        width=64,
        total_timesteps=100_000,
        num_envs=8,
        nsteps=128,
        lr=2.5e-3,
    )


if __name__ == "__main__":
    main()
