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


# ---- Sonic-era wrappers (retro_wrappers.py:48-282 parity) -------------

from baselines_tpu.envs.retro_wrappers import (
    AllowBacktracking,
    AppendTimeout,
    MovieRecord,
    PartialFrameStack,
    SonicDiscretizer,
    StartDoingRandomActionsWrapper,
)


class FakeRetroSpaces(FakeRetro):
    """FakeRetro plus the gymnasium space/emulator attributes the Sonic-era
    wrappers touch (observation_space, action_space, unwrapped,
    _max_episode_steps)."""

    def __init__(self, horizon=1000, rewards=None):
        super().__init__(horizon)
        import gymnasium as gym

        self.observation_space = gym.spaces.Box(0, 255, (64, 64, 3), np.uint8)
        self.action_space = gym.spaces.Discrete(4)
        self._max_episode_steps = horizon
        self.rewards = rewards

    @property
    def unwrapped(self):
        return self

    def step(self, action):
        obs, rew, term, trunc, info = super().step(action)
        if self.rewards is not None:
            rew = self.rewards[(self.t - 1) % len(self.rewards)]
        return obs, rew, term, trunc, info


def test_partial_frame_stack_shapes_and_content():
    env = FakeRetroSpaces()
    pfs = PartialFrameStack(env, k=3, channel=1)
    assert pfs.observation_space.shape == (64, 64, 5)  # 3 + k - 1
    obs, _ = pfs.reset()
    assert obs.shape == (64, 64, 5)
    assert (obs == 0).all()  # reset frame replicated
    pfs.step(0)  # frame value 1
    obs, *_ = pfs.step(0)  # frame value 2
    # channels: [hist0 ch1, hist1 ch1, newest full 3 channels]
    assert obs[0, 0, 0] == 0 and obs[0, 0, 1] == 1
    assert (obs[0, 0, 2:] == 2).all()


def test_movie_record_every_kth_episode():
    env = FakeRetroSpaces(horizon=3)
    rec = MovieRecord(env, savedir="/tmp/movies", k=2)
    rec.reset()
    assert env.movie_path == "/tmp/movies"  # episode 0 records
    rec.reset()
    assert env.movie_path is None and env.movie is None  # episode 1 skips
    rec.reset()
    assert env.movie_path == "/tmp/movies"  # episode 2 records


def test_append_timeout_fraction():
    env = FakeRetroSpaces(horizon=10)
    at = AppendTimeout(env)
    assert at.timeout == 10
    import gymnasium as gym

    assert isinstance(at.observation_space, gym.spaces.Dict)
    obs, _ = at.reset()
    assert obs["value_estimation_timeout"] == 1.0
    assert obs["original"].shape == (64, 64, 3)
    obs, *_ = at.step(0)
    assert np.isclose(obs["value_estimation_timeout"], 0.9)
    for _ in range(4):
        obs, *_ = at.step(0)
    assert np.isclose(obs["value_estimation_timeout"], 0.5)


def test_start_random_actions_warmup_and_reset():
    env = FakeRetroSpaces(horizon=1000)
    w = StartDoingRandomActionsWrapper(env, max_random_steps=8, seed=3)
    burned = len(env.actions)
    assert 0 <= burned < 8  # randint(8) warmup steps already taken
    obs, _ = w.reset()
    assert obs[0, 0, 0] == burned % 251  # reset returns the warmed-up obs
    w.step(2)
    assert env.actions[-1] == 2


def test_start_random_actions_every_episode_reruns_warmup():
    env = FakeRetroSpaces(horizon=2)
    w = StartDoingRandomActionsWrapper(
        env, max_random_steps=5, every_episode=True, seed=0
    )
    env.actions.clear()
    w.step(1)
    w.step(1)  # terminates the 2-step episode -> auto-reset + new warmup
    assert len(env.actions) >= 2  # the two policy actions, plus any warmup


def test_sonic_discretizer_mapping():
    env = FakeRetroSpaces()
    sd = SonicDiscretizer(env)
    assert sd.action_space.n == 7
    recorded = []
    env.step = lambda a: (recorded.append(a), (env._obs(), 0.0, False, False, {}))[1]
    sd.step(1)  # RIGHT
    arr = recorded[-1]
    assert arr.dtype == bool and arr.shape == (12,)
    assert arr[SonicDiscretizer.BUTTONS.index("RIGHT")] and arr.sum() == 1
    sd.step(5)  # DOWN + B spindash
    arr = recorded[-1]
    assert arr[SonicDiscretizer.BUTTONS.index("DOWN")]
    assert arr[SonicDiscretizer.BUTTONS.index("B")] and arr.sum() == 2


def test_allow_backtracking_rewards_max_x_deltas():
    env = FakeRetroSpaces(rewards=[1.0, 2.0, -3.0, 1.0, 3.0])
    ab = AllowBacktracking(env)
    ab.reset()
    rews = [ab.step(0)[1] for _ in range(5)]
    # cur_x: 1, 3, 0, 1, 4 -> max-x deltas: 1, 2, 0, 0, 1
    assert rews == [1.0, 2.0, 0.0, 0.0, 1.0]
