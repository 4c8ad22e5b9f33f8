"""Atari preprocessing stack tested against a fake ALE engine.

Mirrors the vizdoom/dmlab fake-engine test pattern: ale_py is not installed
in CI, so a scripted stand-in exercises the DeepMind wrapper stack
(sf_examples_tpu/atari/atari_utils.py) — the same coverage the reference gets
from tests/envs/atari/test_atari.py with the real emulator.
"""

import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

from sf_examples_tpu.atari.atari_utils import (  # noqa: E402
    ClipRewardEnv,
    EpisodicLifeEnv,
    FireResetEnv,
    FrameStackHWC,
    MaxAndSkipEnv,
    NoopResetEnv,
    atari_env_by_name,
    ATARI_ENVS,
)


class _FakeALE:
    def __init__(self):
        self._lives = 3

    def lives(self):
        return self._lives


class FakeAtariEnv(gym.Env):
    """Scripted ALE stand-in: pixel obs encode the step counter, FIRE required,
    3 lives, one life lost every `life_every` steps, game over when out."""

    observation_space = gym.spaces.Box(0, 255, (210, 160, 3), dtype=np.uint8)
    action_space = gym.spaces.Discrete(4)

    def __init__(self, life_every: int = 10):
        self.ale = _FakeALE()
        self.t = 0
        self.life_every = life_every
        self.actions_taken = []
        self.resets = 0

    def get_action_meanings(self):
        return ["NOOP", "FIRE", "RIGHT", "LEFT"]

    def _obs(self):
        return np.full((210, 160, 3), self.t % 256, dtype=np.uint8)

    def reset(self, seed=None, options=None):
        super().reset(seed=seed)
        self.t = 0
        self.ale._lives = 3
        self.resets += 1
        return self._obs(), {}

    def step(self, action):
        self.actions_taken.append(int(action))
        self.t += 1
        reward = 3.7 if action == 2 else (-2.0 if action == 3 else 0.0)
        if self.t % self.life_every == 0:
            self.ale._lives -= 1
        terminated = self.ale._lives <= 0
        return self._obs(), reward, terminated, False, {}


def test_noop_reset_performs_noops():
    env = NoopResetEnv(FakeAtariEnv(life_every=1000), noop_max=30)
    obs, _ = env.reset(seed=3)
    n = env.unwrapped.t
    assert 1 <= n <= 30
    assert all(a == 0 for a in env.unwrapped.actions_taken)


def test_max_and_skip_sums_reward_and_max_pools():
    base = FakeAtariEnv(life_every=1000)
    env = MaxAndSkipEnv(base, skip=4)
    base.reset()
    obs, reward, term, trunc, info = env.step(2)
    assert reward == pytest.approx(4 * 3.7)
    # max of the last two frames: t=3 and t=4 -> 4
    assert obs[0, 0, 0] == 4
    assert base.t == 4


def test_episodic_life_terminates_without_real_reset():
    base = FakeAtariEnv(life_every=5)
    env = EpisodicLifeEnv(base)
    env.reset()
    resets_before = base.resets
    term = False
    steps = 0
    while not term:
        obs, r, term, trunc, info = env.step(0)
        steps += 1
    assert steps == 5  # life lost -> virtual termination
    assert base.resets == resets_before  # no real reset happened
    env.reset()  # virtual reset: advances one step, still same game
    assert base.resets == resets_before
    assert base.ale.lives() == 2


def test_fire_reset_presses_fire():
    base = FakeAtariEnv(life_every=1000)
    env = FireResetEnv(base)
    env.reset()
    assert base.actions_taken[0] == 1  # FIRE


def test_clip_reward_sign():
    env = ClipRewardEnv(FakeAtariEnv(life_every=1000))
    env.reset()
    _, r_pos, *_ = env.step(2)
    _, r_neg, *_ = env.step(3)
    _, r_zero, *_ = env.step(0)
    assert (r_pos, r_neg, r_zero) == (1.0, -1.0, 0.0)


def test_full_stack_shapes_and_dtype():
    """The full make_atari_env wrapper order on the fake engine: HWC uint8
    84x84xk frames, frame roll on step."""
    cfg = type("C", (), {"env_frameskip": 4, "env_framestack": 4})()
    env = FakeAtariEnv(life_every=1000)
    env = gym.wrappers.RecordEpisodeStatistics(env)
    env = NoopResetEnv(env, noop_max=5)
    env = MaxAndSkipEnv(env, skip=cfg.env_frameskip)
    env = EpisodicLifeEnv(env)
    env = FireResetEnv(env)
    env = ClipRewardEnv(env)
    env = gym.wrappers.ResizeObservation(env, (84, 84))
    env = gym.wrappers.GrayscaleObservation(env)
    env = FrameStackHWC(env, cfg.env_framestack)

    obs, info = env.reset(seed=0)
    assert obs.shape == (84, 84, 4) and obs.dtype == np.uint8
    # all stacked frames identical after reset
    assert (obs[..., 0] == obs[..., -1]).all()
    obs2, r, term, trunc, info = env.step(0)
    assert obs2.shape == (84, 84, 4)
    # newest frame lands in the last channel; the oldest rolled out
    assert (obs2[..., :-1] == obs[..., 1:]).all()


def test_atari_env_registry_names():
    assert len(ATARI_ENVS) >= 57
    spec = atari_env_by_name("atari_breakout")
    assert spec.env_id == "BreakoutNoFrameskip-v4"
    with pytest.raises(ValueError):
        atari_env_by_name("atari_notagame")
