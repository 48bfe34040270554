"""ACKTR defaults (acktr/defaults.py parity: mujoco used its own old
acktr_cont; modern acktr defaults live in the learn signature)."""


def mujoco():
    return dict(nsteps=2500)


def classic_control():
    return dict(nsteps=20, num_envs=8)


def testing():
    return dict(nsteps=20, num_envs=8, gamma=0.9)
