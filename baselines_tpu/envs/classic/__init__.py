from baselines_tpu.envs.classic.cartpole import CartPole
from baselines_tpu.envs.classic.pendulum import Pendulum
from baselines_tpu.envs.classic.mountain_car import MountainCar, MountainCarContinuous
from baselines_tpu.envs.classic.acrobot import Acrobot

__all__ = ["CartPole", "Pendulum", "MountainCar", "MountainCarContinuous", "Acrobot"]
