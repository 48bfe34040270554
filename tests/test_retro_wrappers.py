"""Retro wrapper-chain logic exercised WITHOUT the retro emulator.

FakeRetro is a deterministic stand-in for a retro.RetroEnv: every raw action
is logged and frames encode the step counter, so the documented semantics of
StochasticFrameSkip (sticky first substep — retro_wrappers.py:10-50),
Downsample, Rgb2gray, RewardScaler, and the wrap_deepmind_retro chain
(retro_wrappers.py parity) are all observable in this image."""

import numpy as np
import pytest

from baselines_tpu.envs.retro_wrappers import (
    Downsample,
    Rgb2gray,
    RewardScaler,
    StochasticFrameSkip,
    wrap_deepmind_retro,
)


class FakeRetro:
    """Raw step t -> obs full((64, 64, 3), t % 251); reward 1.0 per raw
    frame; terminates at `horizon` raw frames; logs every raw action."""

    def __init__(self, horizon=1000):
        self.horizon = horizon
        self.actions = []
        self.t = 0

    def reset(self, **kwargs):
        self.t = 0
        return self._obs(), {}

    def _obs(self):
        return np.full((64, 64, 3), self.t % 251, np.uint8)

    def step(self, action):
        self.actions.append(int(action))
        self.t += 1
        term = self.t >= self.horizon
        return self._obs(), 1.0, term, False, {}


def test_frameskip_accumulates_and_counts_frames():
    env = FakeRetro()
    skip = StochasticFrameSkip(env, n=4, stickprob=0.0, seed=0)
    skip.reset()
    obs, rew, term, trunc, info = skip.step(7)
    assert rew == 4.0  # reward summed over the n substeps
    assert env.t == 4 and env.actions == [7, 7, 7, 7]
    assert obs[0, 0, 0] == 4  # obs is the LAST substep's frame


def test_frameskip_stickprob_zero_never_sticks():
    env = FakeRetro()
    skip = StochasticFrameSkip(env, n=2, stickprob=0.0, seed=0)
    skip.reset()
    skip.step(1)
    skip.step(2)
    skip.step(3)
    assert env.actions == [1, 1, 2, 2, 3, 3]


def test_frameskip_stickprob_one_always_sticks_first_substep():
    env = FakeRetro()
    skip = StochasticFrameSkip(env, n=3, stickprob=1.0, seed=0)
    skip.reset()
    skip.step(1)  # curac None -> adopts 1 immediately
    skip.step(2)  # substep 0 sticks with prev action, substep 1 switches
    skip.step(3)
    # ref retro_wrappers.py:33-40: i==0 keeps curac w.p. stickprob,
    # i==1 always adopts the new action
    assert env.actions == [1, 1, 1, 1, 2, 2, 2, 3, 3]


def test_frameskip_breaks_on_termination():
    env = FakeRetro(horizon=2)
    skip = StochasticFrameSkip(env, n=4, stickprob=0.0, seed=0)
    skip.reset()
    obs, rew, term, trunc, info = skip.step(0)
    assert term and rew == 2.0 and env.t == 2  # stopped mid-skip


def test_frameskip_reset_clears_sticky_action():
    env = FakeRetro()
    skip = StochasticFrameSkip(env, n=1, stickprob=1.0, seed=0)
    skip.reset()
    skip.step(5)
    skip.reset()
    skip.step(9)  # after reset curac is None again -> adopts 9, never 5
    assert env.actions == [5, 9]


def test_downsample_and_rgb2gray():
    env = FakeRetro()
    ds = Downsample(env, ratio=2)
    obs, _ = ds.reset()
    assert obs.shape == (32, 32, 3)
    gray = Rgb2gray(FakeRetro())
    obs, _ = gray.reset()
    assert obs.shape == (64, 64, 1) and obs.dtype == np.uint8


def test_reward_scaler():
    env = RewardScaler(FakeRetro(), scale=0.01)
    env.reset()
    _, rew, *_ = env.step(0)
    assert rew == pytest.approx(0.01)


def test_wrap_deepmind_retro_chain():
    """WarpFrame 84x84 gray + sign reward clip on an RGB retro stream."""
    env = wrap_deepmind_retro(FakeRetro())
    obs, _ = env.reset()
    assert obs.shape == (84, 84, 1) and obs.dtype == np.uint8
    obs, rew, term, trunc, info = env.step(0)
    assert rew == 1.0  # clip is sign(): 1.0 -> 1.0
    scaled = wrap_deepmind_retro(RewardScaler(FakeRetro(), 0.01))
    scaled.reset()
    _, rew, *_ = scaled.step(0)
    assert rew == 1.0  # sign(0.01) == 1
