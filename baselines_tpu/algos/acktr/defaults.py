"""ACKTR defaults (acktr/defaults.py parity: mujoco used its own old
acktr_cont; modern acktr defaults live in the learn signature)."""


def atari():
    # reference acktr runs the Nature CNN on Atari with kfac_update=1 but
    # amortizes eigendecomps in async queue-runner threads
    # (acktr/acktr.py:126-130); a synchronous every-10-updates cadence is the
    # on-device equivalent.
    return dict(network="cnn", nsteps=20, kfac_update=10)


def mujoco():
    return dict(nsteps=2500)


def classic_control():
    return dict(nsteps=20, num_envs=8)


def testing():
    return dict(nsteps=20, num_envs=8, gamma=0.9)
