"""Retro (Sega/SNES) wrappers — parity with baselines/common/retro_wrappers.py.

The `retro` emulator package is optional (not present in every image), so
everything importing it is deferred; the generic wrappers
(StochasticFrameSkip :10-50, Downsample, Rgb2gray, RewardScaler,
TimeLimit-by-steps) work on any gymnasium env.
"""

from __future__ import annotations

import numpy as np


class StochasticFrameSkip:
    """retro_wrappers.py:10-50: repeat the previous action with prob
    stickprob at each sub-step of an n-frame skip."""

    def __init__(self, env, n, stickprob, seed=None):
        self.env = env
        self.n = n
        self.stickprob = stickprob
        self.curac = None
        self.rng = np.random.RandomState(seed)

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        self.curac = None
        return self.env.reset(**kwargs)

    def step(self, ac):
        terminated = truncated = False
        totrew = 0
        info = {}
        obs = None
        for i in range(self.n):
            # first substep: maybe keep the previous action
            if self.curac is None:
                self.curac = ac
            elif i == 0:
                if self.rng.rand() > self.stickprob:
                    self.curac = ac
            elif i == 1:
                self.curac = ac
            obs, rew, terminated, truncated, info = self.env.step(self.curac)
            totrew += rew
            if terminated or truncated:
                break
        return obs, totrew, terminated, truncated, info


class Downsample:
    """retro_wrappers.py: downsample observation by an integer ratio."""

    def __init__(self, env, ratio):
        self.env = env
        self.ratio = ratio

    def __getattr__(self, name):
        return getattr(self.env, name)

    def _ds(self, frame):
        return frame[:: self.ratio, :: self.ratio]

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        return self._ds(obs), info

    def step(self, action):
        obs, rew, term, trunc, info = self.env.step(action)
        return self._ds(obs), rew, term, trunc, info


class Rgb2gray:
    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    @staticmethod
    def _gray(frame):
        return np.mean(frame, axis=-1, keepdims=True).astype(np.uint8)

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        return self._gray(obs), info

    def step(self, action):
        obs, rew, term, trunc, info = self.env.step(action)
        return self._gray(obs), rew, term, trunc, info


class RewardScaler:
    """retro_wrappers.py RewardScaler — PPO-scale reward shaping."""

    def __init__(self, env, scale=0.01):
        self.env = env
        self.scale = scale

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        return self.env.reset(**kwargs)

    def step(self, action):
        obs, rew, term, trunc, info = self.env.step(action)
        return obs, rew * self.scale, term, trunc, info


class PartialFrameStack:
    """retro_wrappers.py:48-77 semantics: stack k frames along channels, but
    keep only ONE channel (`channel`) of each historical frame — the newest
    frame contributes all its channels.  Output shape (h, w, c + k - 1)."""

    def __init__(self, env, k, channel=1):
        from collections import deque

        self.env = env
        self.k = k
        self.channel = channel
        self.frames = deque(maxlen=k)
        if hasattr(env, "observation_space"):
            import gymnasium as gym

            h, w, c = env.observation_space.shape
            self.observation_space = gym.spaces.Box(
                low=0, high=255, shape=(h, w, c + k - 1),
                dtype=env.observation_space.dtype,
            )

    def __getattr__(self, name):
        return getattr(self.env, name)

    def _get_ob(self):
        assert len(self.frames) == self.k
        parts = [
            f if i == self.k - 1 else f[:, :, self.channel : self.channel + 1]
            for i, f in enumerate(self.frames)
        ]
        return np.concatenate(parts, axis=2)

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        assert obs.shape[2] > self.channel
        for _ in range(self.k):
            self.frames.append(obs)
        return self._get_ob(), info

    def step(self, action):
        obs, rew, term, trunc, info = self.env.step(action)
        self.frames.append(obs)
        return self._get_ob(), rew, term, trunc, info


class MovieRecord:
    """retro_wrappers.py:113-126: record every k-th episode by pointing the
    emulator's movie_path at savedir on reset (cleared otherwise)."""

    def __init__(self, env, savedir, k):
        self.env = env
        self.savedir = savedir
        self.k = k
        self.epcount = 0

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        base = getattr(self.env, "unwrapped", self.env)
        if self.epcount % self.k == 0:
            base.movie_path = self.savedir
        else:
            base.movie_path = None
            base.movie = None
        self.epcount += 1
        return self.env.reset(**kwargs)

    def step(self, action):
        return self.env.step(action)


class AppendTimeout:
    """retro_wrappers.py:128-168: expose the fraction of the episode budget
    REMAINING as a 'value_estimation_timeout' observation entry so the value
    function can see the truncation horizon.  Dict observations gain a key;
    array observations become {'original': obs, 'value_estimation_timeout'}."""

    def __init__(self, env):
        self.env = env
        self.ac_count = 0
        # find the episode budget on the TimeLimit wrapper in the chain
        e = env
        while not hasattr(e, "_max_episode_steps"):
            e = e.env
        self.timeout = e._max_episode_steps
        if hasattr(env, "observation_space"):
            import gymnasium as gym

            t_space = gym.spaces.Box(low=0.0, high=1.0, shape=(1,), dtype=np.float32)
            orig = env.observation_space
            self.dict_mode = isinstance(orig, gym.spaces.Dict)
            if self.dict_mode:
                spaces = dict(orig.spaces)
                spaces["value_estimation_timeout"] = t_space
                self.observation_space = gym.spaces.Dict(spaces)
            else:
                self.observation_space = gym.spaces.Dict(
                    {"original": orig, "value_estimation_timeout": t_space}
                )
        else:
            self.dict_mode = False

    def __getattr__(self, name):
        return getattr(self.env, name)

    def _process(self, ob):
        fracmissing = 1.0 - self.ac_count / self.timeout
        if self.dict_mode:
            ob = dict(ob)
            ob["value_estimation_timeout"] = fracmissing
            return ob
        return {"original": ob, "value_estimation_timeout": fracmissing}

    def reset(self, **kwargs):
        self.ac_count = 0
        obs, info = self.env.reset(**kwargs)
        return self._process(obs), info

    def step(self, action):
        self.ac_count += 1
        obs, rew, term, trunc, info = self.env.step(action)
        return self._process(obs), rew, term, trunc, info


class StartDoingRandomActionsWrapper:
    """retro_wrappers.py:170-198: burn a random number of random actions at
    startup (and optionally after every episode) so each run starts from a
    decorrelated emulator state.  Auto-resets on done; like the reference,
    intermediate info dicts are consumed."""

    def __init__(self, env, max_random_steps, on_startup=True, every_episode=False, seed=None):
        self.env = env
        self.random_steps = max_random_steps
        self.every_episode = every_episode
        self.rng = np.random.RandomState(seed)
        self.last_obs = None
        self.last_info = {}
        if on_startup:
            self.some_random_steps()

    def __getattr__(self, name):
        return getattr(self.env, name)

    def some_random_steps(self):
        self.last_obs, self.last_info = self.env.reset()
        n = self.rng.randint(self.random_steps)
        for _ in range(n):
            self.last_obs, _, term, trunc, self.last_info = self.env.step(
                self.env.action_space.sample()
            )
            if term or trunc:
                self.last_obs, self.last_info = self.env.reset()

    def reset(self, **kwargs):
        return self.last_obs, self.last_info

    def step(self, action):
        self.last_obs, rew, term, trunc, info = self.env.step(action)
        if term or trunc:
            self.last_obs, _ = self.env.reset()
            if self.every_episode:
                self.some_random_steps()
        return self.last_obs, rew, term, trunc, info


class SonicDiscretizer:
    """retro_wrappers.py:224-243: reduce the Genesis 12-button space to the
    7 combos useful for Sonic (LEFT, RIGHT, LEFT+DOWN, RIGHT+DOWN, DOWN,
    DOWN+B spindash, B jump)."""

    BUTTONS = ["B", "A", "MODE", "START", "UP", "DOWN", "LEFT", "RIGHT", "C", "Y", "X", "Z"]
    COMBOS = (
        ("LEFT",), ("RIGHT",), ("LEFT", "DOWN"), ("RIGHT", "DOWN"),
        ("DOWN",), ("DOWN", "B"), ("B",),
    )

    def __init__(self, env):
        self.env = env
        self._actions = []
        for combo in self.COMBOS:
            arr = np.zeros(len(self.BUTTONS), dtype=bool)
            arr[[self.BUTTONS.index(b) for b in combo]] = True
            self._actions.append(arr)
        import gymnasium as gym

        self.action_space = gym.spaces.Discrete(len(self._actions))

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        return self.env.reset(**kwargs)

    def step(self, action):
        return self.env.step(self._actions[int(action)].copy())


class AllowBacktracking:
    """retro_wrappers.py:258-282: reward deltas in max(x) instead of deltas
    in x, so exploring backwards out of a dead end is not punished."""

    def __init__(self, env):
        self.env = env
        self._cur_x = 0.0
        self._max_x = 0.0

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        self._cur_x = 0.0
        self._max_x = 0.0
        return self.env.reset(**kwargs)

    def step(self, action):
        obs, rew, term, trunc, info = self.env.step(action)
        self._cur_x += rew
        rew = max(0.0, self._cur_x - self._max_x)
        self._max_x = max(self._max_x, self._cur_x)
        return obs, rew, term, trunc, info


def make_retro(*, game, state=None, max_episode_steps=4500, **kwargs):
    """retro_wrappers.make_retro parity; requires the `retro` package."""
    import retro

    if state is None:
        state = retro.State.DEFAULT
    env = retro.make(game, state, **kwargs)
    env = StochasticFrameSkip(env, n=4, stickprob=0.25)
    if max_episode_steps is not None:
        import gymnasium as gym

        env = gym.wrappers.TimeLimit(env, max_episode_steps=max_episode_steps)
    return env


def make_retro_vec_env(env_id: str, num_envs: int, gamestate=None, frame_stack: int = 4):
    """Retro pipeline behind the io_callback bridge — the --gamestate CLI
    surface (ref run.py:99-101: retro envs get gamestate + retro wrapper
    chain).  Requires the `retro` package."""
    from baselines_tpu.envs.callback_env import CallbackVecEnv
    from baselines_tpu.envs.gym_bridge import HostDummyVecEnv, HostSubprocVecEnv
    from baselines_tpu.envs.vec import VecFrameStack

    def thunk():
        return wrap_deepmind_retro(make_retro(game=env_id, state=gamestate))

    host = (
        HostSubprocVecEnv([thunk] * num_envs)
        if num_envs > 1
        else HostDummyVecEnv([thunk])
    )
    venv = CallbackVecEnv(host)
    return VecFrameStack(venv, frame_stack) if frame_stack > 1 else venv


def wrap_deepmind_retro(env, scale=True, frame_stack=4):
    """retro_wrappers.wrap_deepmind_retro parity: warp + reward scale;
    frame stacking happens on device (VecFrameStack)."""
    from baselines_tpu.envs.atari import WarpFrame, ClipRewardEnv

    env = WarpFrame(env)
    env = ClipRewardEnv(env)
    return env
