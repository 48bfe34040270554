"""A2C per-env-type defaults (a2c has none in the reference beyond atari
conventions in a2c/a2c.py docstring defaults; nsteps=5, lr=7e-4)."""


def atari():
    return dict(nsteps=5, lrschedule="linear", num_envs=16)


def classic_control():
    return dict(nsteps=5, num_envs=8)


def testing():
    return dict(nsteps=5, num_envs=8, gamma=0.9)
