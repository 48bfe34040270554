"""Atari wrapper-chain logic exercised WITHOUT ALE (VERDICT r1 item 6).

FakeALE is a deterministic stand-in for a gymnasium ALE env: frames encode
the raw frame counter, rewards follow a known schedule, lives drop on a
fixed period, and every raw action is logged — so the documented semantics
of NoopReset/MaxAndSkip/EpisodicLife/FireReset/WarpFrame/ClipReward
(atari_wrappers.py:12-185) are all observable."""

import types

import numpy as np
import pytest

from baselines_tpu.envs.atari import (
    ClipRewardEnv,
    EpisodicLifeEnv,
    FireResetEnv,
    MaxAndSkipEnv,
    NoopResetEnv,
    WarpFrame,
)


class FakeALE:
    """Raw frame t -> obs full((40,40,3), t % 251); reward 1 at t%5==0 plus
    -2 at t%13==0; one life lost every `life_every` frames; game over at 0
    lives. Action meanings follow Breakout (NOOP/FIRE/RIGHT/LEFT)."""

    def __init__(self, life_every=20, start_lives=3, seed=0):
        self.life_every = life_every
        self.start_lives = start_lives
        self.np_random = np.random.default_rng(seed)
        self.actions = []  # every raw action ever stepped
        self.resets = 0
        self.observation_space = types.SimpleNamespace(
            shape=(40, 40, 3), dtype=np.uint8
        )
        self.ale = types.SimpleNamespace(lives=lambda: self.lives)
        self.t = 0
        self.lives = start_lives

    @property
    def unwrapped(self):
        return self

    def get_action_meanings(self):
        return ["NOOP", "FIRE", "RIGHT", "LEFT"]

    def _frame(self):
        return np.full((40, 40, 3), self.t % 251, np.uint8)

    def reset(self, **kwargs):
        self.resets += 1
        self.t = 0
        self.lives = self.start_lives
        return self._frame(), {}

    def step(self, action):
        self.actions.append(int(action))
        self.t += 1
        reward = (1.0 if self.t % 5 == 0 else 0.0) + (
            -2.0 if self.t % 13 == 0 else 0.0
        )
        if self.t % self.life_every == 0:
            self.lives -= 1
        terminated = self.lives == 0
        return self._frame(), reward, terminated, False, {}


def test_noop_reset_steps_seeded_noops():
    fake = FakeALE(seed=7)
    env = NoopResetEnv(fake, noop_max=12)
    expected = np.random.default_rng(7).integers(1, 13)
    env.reset()
    assert fake.t == expected
    assert fake.actions == [0] * expected  # noops only (atari_wrappers.py:28-38)


def test_max_and_skip_sums_reward_and_maxes_last_two():
    fake = FakeALE(life_every=10_000)
    env = MaxAndSkipEnv(fake, skip=4)
    env.reset()
    obs, reward, term, trunc, _ = env.step(3)
    # 4 raw frames ran (t: 1..4); reward summed over them: t=0? none in 1..4
    # divisible by 5 or 13 -> 0
    assert fake.t == 4 and fake.actions == [3] * 4
    assert reward == 0.0
    # frames are monotone in t below 251: max(last two) == frame(t)
    assert obs.max() == obs.min() == 4
    obs, reward, *_ = env.step(2)
    # t: 5..8 -> reward 1 at t=5
    assert reward == 1.0 and obs.max() == 8
    # t: 9..12 -> +1 at 10, -2 at 13? no (13 not reached): just +1 at 10
    obs, reward, *_ = env.step(0)
    assert reward == 1.0
    # t: 13..16 -> -2 at 13, +1 at 15 = -1
    obs, reward, *_ = env.step(0)
    assert reward == -1.0


def test_episodic_life_fake_done_then_real_reset():
    fake = FakeALE(life_every=5, start_lives=2)
    env = EpisodicLifeEnv(fake)
    env.reset()
    for i in range(4):
        _, _, term, trunc, _ = env.step(0)
        assert not (term or trunc)
    _, _, term, _, _ = env.step(0)  # t=5: life 2 -> 1
    assert term and fake.lives == 1
    assert not env.was_real_done
    # reset after a fake done continues the SAME game via one noop step
    t_before, resets_before = fake.t, fake.resets
    env.reset()
    assert fake.resets == resets_before  # no underlying reset (:86-90)
    assert fake.t == t_before + 1 and fake.actions[-1] == 0
    # play to true game over: t=10 -> lives 0 -> terminated from the game
    for _ in range(4):
        env.step(0)
    _, _, term, _, _ = env.step(0)
    assert term and env.was_real_done and fake.lives == 0
    env.reset()
    assert fake.resets == resets_before + 1 and fake.t == 0  # full reset


def test_fire_reset_presses_fire_then_second_action():
    fake = FakeALE(life_every=10_000)
    env = FireResetEnv(fake)
    env.reset()
    assert fake.actions == [1, 2]  # atari_wrappers.py:48-58


def test_warp_frame_84x84_grayscale():
    pytest.importorskip("cv2")
    fake = FakeALE(life_every=10_000)
    env = WarpFrame(fake)
    obs, _ = env.reset()
    assert obs.shape == (84, 84, 1) and obs.dtype == np.uint8
    # constant RGB frame -> the same constant in grayscale
    obs, *_ = env.step(0)
    assert obs.min() == obs.max() == 1


def test_clip_reward_signs():
    fake = FakeALE(life_every=10_000)
    env = ClipRewardEnv(fake)
    env.reset()
    rewards = [env.step(0)[1] for _ in range(15)]
    # raw schedule: +1 at 5,10,15; -2 at 13 -> signs
    assert set(rewards) <= {-1.0, 0.0, 1.0}
    assert rewards[4] == 1.0 and rewards[12] == -1.0 and rewards[0] == 0.0


def test_full_deepmind_chain_interplay():
    """make_atari+wrap_deepmind order (atari_wrappers.py:266-289): noop
    reset runs first, frame-skip groups of 4 raw frames, life loss emits a
    fake done without resetting the game, fire is pressed on every
    (episodic) reset, rewards are 4-frame sums clipped to sign."""
    pytest.importorskip("cv2")
    fake = FakeALE(life_every=100, start_lives=2, seed=3)
    env = NoopResetEnv(fake, noop_max=6)
    env = MaxAndSkipEnv(env, skip=4)
    env = EpisodicLifeEnv(env)
    env = FireResetEnv(env)
    env = WarpFrame(env)
    env = ClipRewardEnv(env)

    obs, _ = env.reset()
    noops = np.random.default_rng(3).integers(1, 7)
    # raw actions: noops, then FIRE and the second action through the skip
    assert fake.actions == [0] * noops + [1] * 4 + [2] * 4
    assert obs.shape == (84, 84, 1)

    # step until the life-loss fake done
    steps = 0
    term = False
    while not term:
        obs, reward, term, trunc, _ = env.step(0)
        steps += 1
        assert reward in (-1.0, 0.0, 1.0)
    assert fake.lives == 1 and fake.resets == 1  # game continues
    assert fake.t >= 100  # life lost at raw frame 100

    # episodic reset: no underlying reset; noop step + FIRE sequence
    t_before = fake.t
    env.reset()
    assert fake.resets == 1
    assert fake.t == t_before + 4 + 8  # 1 noop skip-group + fire/second groups

    # true game over at raw frame 200 -> full reset with new noops
    term = False
    while not term:
        _, _, term, trunc, _ = env.step(0)
    env.reset()
    assert fake.resets == 2 and fake.t <= 6 + 12
