"""info['terminal_obs'] must live in the SAME space as obs through every
wrapper — replay learners (dqn/ddpg) store it as the true s', so an
untransformed terminal obs silently corrupts the replay buffer (and shape-
mismatches for VecFrameStack/VecS2D).  Round-3 regression: all three
transforming wrappers (VecNormalize, VecFrameStack, VecS2D) used to pass
it through raw."""

import jax
import jax.numpy as jnp
import numpy as np

from baselines_tpu.envs.registry import make_env
from baselines_tpu.envs.vec import (
    VecFrameStack,
    VecJaxEnv,
    VecMonitor,
    VecNormalize,
    VecS2D,
)


def _run_until_done(venv, nsteps=40):
    key = jax.random.PRNGKey(0)
    obs, state = venv.reset(key)
    hit = None
    for i in range(nsteps):
        key, kstep = jax.random.split(key)
        actions = jnp.zeros((venv.num_envs,), jnp.int32)
        nobs, state, rew, done, info = venv.step(kstep, state, actions)
        assert info["terminal_obs"].shape == nobs.shape, (
            f"terminal_obs {info['terminal_obs'].shape} vs obs {nobs.shape}"
        )
        if bool(jnp.any(done)):
            hit = (nobs, done, info)
        obs = nobs
    return hit


def test_terminal_obs_shape_through_framestack_s2d():
    from baselines_tpu.envs.testing.atari_sim import AtariSim

    venv = VecS2D(VecFrameStack(VecMonitor(VecJaxEnv(AtariSim(episode_len=6), 2)), 2), 4)
    assert venv.observation_space.shape == (21, 21, 128)
    hit = _run_until_done(venv, nsteps=8)
    assert hit is not None, "no episode boundary crossed"
    nobs, done, info = hit
    # where done: obs is the post-reset stack (older half zeroed), while
    # terminal_obs is the pre-reset stack (older half nonzero in general)
    i = int(jnp.argmax(done))
    assert not bool(jnp.all(info["terminal_obs"][i] == nobs[i]))


def test_terminal_obs_normalized_space():
    from baselines_tpu.envs.testing.identity import BoxIdentityEnv

    venv = VecNormalize(VecMonitor(VecJaxEnv(BoxIdentityEnv((3,), episode_len=4), 2)))
    key = jax.random.PRNGKey(1)
    obs, state = venv.reset(key)
    for _ in range(10):
        key, kstep = jax.random.split(key)
        actions = jnp.zeros((2, 3), jnp.float32)
        nobs, state, rew, done, info = venv.step(kstep, state, actions)
        if bool(jnp.any(done)):
            # normalized obs are clipped to [-10, 10] and terminal_obs must
            # be on the same scale: for a non-done env the terminal_obs IS
            # the next obs, so they must match exactly
            j = int(jnp.argmin(done))
            if not bool(done[j]):
                np.testing.assert_allclose(
                    np.asarray(info["terminal_obs"][j]), np.asarray(nobs[j]), rtol=1e-6
                )
            return
    raise AssertionError("no episode boundary crossed")
