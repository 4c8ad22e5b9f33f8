"""ViZDoom integration tests that don't need the vizdoom engine: action-space
flattening, spec registry, the info-dict-driven wrapper stack (reward shaping,
measurements, match stats), the doom encoder, and the generic wrappers the
doom stack relies on (resize / time limit / reward scaling)."""

from __future__ import annotations

import gymnasium as gym
import numpy as np
import pytest
from gymnasium.spaces import Box, Discrete

from sample_factory_tpu.envs.discretized import Discretized
from sample_factory_tpu.envs.gym_wrappers import ResizeWrapper, RewardScalingWrapper, TimeLimitWrapper
from sf_examples_tpu.vizdoom.doom.action_space import (
    doom_action_space,
    doom_action_space_basic,
    doom_action_space_discretized_no_weap,
    doom_action_space_full_discretized,
    flatten_doom_action,
)
from sf_examples_tpu.vizdoom.doom.wrappers import (
    REWARD_SHAPING_BATTLE,
    REWARD_SHAPING_DEATHMATCH_V0,
    REWARD_SHAPING_DEATHMATCH_V1,
    DoomAdditionalInput,
    DoomGatheringRewardShaping,
    DoomRewardShapingWrapper,
    MultiplayerStatsWrapper,
    true_objective_frags,
    true_objective_winning_the_game,
)
from sf_examples_tpu.vizdoom.doom_utils import DOOM_ENVS, doom_env_by_name


# ---------------------------------------------------------------- actions


def test_flatten_simple_discrete():
    space = Discrete(4)
    assert flatten_doom_action(space, 0) == [0, 0, 0]  # 0 = no-op
    assert flatten_doom_action(space, 2) == [0, 1, 0]


def test_flatten_composite():
    space = doom_action_space_basic()  # Tuple(Discrete(3), Discrete(3))
    assert flatten_doom_action(space, (1, 2)) == [1, 0, 0, 1]
    assert flatten_doom_action(space, (0, 0)) == [0, 0, 0, 0]


def test_flatten_discretized_turning():
    space = doom_action_space_discretized_no_weap()
    flat = flatten_doom_action(space, (0, 0, 0, 0, 0))
    # 2+2+1+1 one-hot slots + 1 continuous value
    assert len(flat) == 7
    assert flat[-1] == pytest.approx(-10.0)  # bin 0 of Discretized(11, -10, 10)
    flat = flatten_doom_action(space, (0, 0, 0, 0, 10))
    assert flat[-1] == pytest.approx(+10.0)
    flat = flatten_doom_action(space, (0, 0, 0, 0, 5))
    assert flat[-1] == pytest.approx(0.0)


def test_flatten_box_delta_scaled():
    space = doom_action_space()  # last subspace is Box(-1, 1, (1,))
    flat = flatten_doom_action(space, (0, 0, 0, 0, 0, np.array([0.5], np.float32)))
    assert flat[-1] == pytest.approx(0.5 * 7.5)


def test_full_discretized_space_shape():
    space = doom_action_space_full_discretized(with_use=True)
    assert len(space.spaces) == 7
    assert isinstance(space.spaces[-1], Discretized)
    assert space.spaces[-1].n == 21


# ---------------------------------------------------------------- registry


def test_spec_registry():
    names = [s.name for s in DOOM_ENVS]
    assert len(names) == len(set(names))
    for expected in (
        "doom_basic",
        "doom_battle",
        "doom_battle2",
        "doom_benchmark",
        "doom_duel",
        "doom_deathmatch_full",
        "doom_health_gathering_supreme",
        "doom_dm",
    ):
        assert expected in names

    battle = doom_env_by_name("doom_battle")
    assert battle.default_timeout == 2100
    assert len(battle.extra_wrappers) == 2  # measurements + reward shaping

    duel = doom_env_by_name("doom_duel")
    assert duel.num_agents == 2 and duel.respawn_delay == 2

    with pytest.raises(RuntimeError):
        doom_env_by_name("doom_nonexistent")


# ---------------------------------------------------------------- fake env


class FakeDoomEnv(gym.Env):
    """Emits a scripted sequence of (reward, info) steps; mimics VizdoomEnv's
    game-variable infos."""

    def __init__(self, script, obs_shape=(32, 32, 3)):
        self.script = list(script)
        self.observation_space = Box(0, 255, obs_shape, dtype=np.uint8)
        self.action_space = Discrete(4)
        self._t = 0
        self._obs = np.zeros(obs_shape, np.uint8)
        self.reward_shaping_interface = None

    def get_info(self):
        return dict(self.script[min(self._t, len(self.script) - 1)][1])

    def reset(self, *, seed=None, options=None):
        self._t = 0
        return self._obs, {}

    def step(self, action):
        reward, info = self.script[self._t]
        self._t += 1
        done = self._t >= len(self.script)
        return self._obs, reward, done, False, dict(info)


def test_reward_shaping_deltas():
    script = [
        (0.0, {"FRAGCOUNT": 0, "HEALTH": 100, "DEAD": 0.0}),
        (0.0, {"FRAGCOUNT": 1, "HEALTH": 100, "DEAD": 0.0}),  # +1 frag
        (0.0, {"FRAGCOUNT": 1, "HEALTH": 70, "DEAD": 0.0}),  # -30 health
        (1.0, {"FRAGCOUNT": 1, "HEALTH": 70, "DEAD": 0.0}),
    ]
    env = DoomRewardShapingWrapper(
        FakeDoomEnv(script), reward_shaping_scheme=REWARD_SHAPING_DEATHMATCH_V0, true_objective_func=None
    )
    env.reset()
    _, r0, *_ = env.step(0)  # first step: no prev vars -> no shaping
    assert r0 == 0.0
    _, r1, *_ = env.step(0)
    assert r1 == pytest.approx(1.0)  # FRAGCOUNT delta +1 * reward 1
    _, r2, *_ = env.step(0)
    assert r2 == pytest.approx(-30 * 0.003)  # health loss penalty (-delta * rewards[1])
    _, r3, term, trunc, info = env.step(0)
    assert term
    # true objective defaults to unshaped env reward
    assert info["true_objective"] == pytest.approx(1.0)


def test_reward_shaping_delta_cap():
    script = [
        (0.0, {"DAMAGECOUNT": 0, "DEAD": 0.0}),
        (0.0, {"DAMAGECOUNT": 1000, "DEAD": 0.0}),  # capped at 200
        (0.0, {"DAMAGECOUNT": 1000, "DEAD": 0.0}),
    ]
    env = DoomRewardShapingWrapper(FakeDoomEnv(script), reward_shaping_scheme=REWARD_SHAPING_BATTLE)
    env.reset()
    env.step(0)
    _, r, *_ = env.step(0)
    assert r == pytest.approx(200 * 0.003)


def test_reward_shaping_pbt_interface():
    env = DoomRewardShapingWrapper(FakeDoomEnv([(0.0, {})]), reward_shaping_scheme=REWARD_SHAPING_DEATHMATCH_V1)
    assert env.get_default_reward_shaping()["delta"]["FRAGCOUNT"] == (+1, -0.001)
    mutated = {"delta": {"FRAGCOUNT": (+2.0, 0.0)}, "selected_weapon": {}}
    env.set_reward_shaping(mutated, 0)
    assert env.get_default_reward_shaping() is mutated
    # the wrapper registers itself on the base env for PBT discovery
    assert env.env.unwrapped.reward_shaping_interface is env


def test_true_objectives():
    assert true_objective_frags({"FRAGCOUNT": 7}) == 7.0
    assert true_objective_winning_the_game({"LEADER_GAP": 0, "FINAL_PLACE": 1}) == 0.0  # tie
    assert true_objective_winning_the_game({"LEADER_GAP": -3, "FINAL_PLACE": 1}) == 1.0  # win
    assert true_objective_winning_the_game({"LEADER_GAP": 5, "FINAL_PLACE": 3}) == 0.0  # loss


def test_gathering_shaping():
    script = [
        (0.0, {"HEALTH": 50}),
        (0.0, {"HEALTH": 40}),  # losing health: no shaping
        (0.0, {"HEALTH": 60}),  # medkit! +1
        (0.5, {"HEALTH": 60}),
    ]
    env = DoomGatheringRewardShaping(FakeDoomEnv(script))
    env.reset()
    _, r0, *_ = env.step(0)
    _, r1, *_ = env.step(0)
    _, r2, *_ = env.step(0)
    assert (r0, r1, r2) == (0.0, 0.0, 1.0)
    _, _, term, _, info = env.step(0)
    assert term and info["true_objective"] == pytest.approx(0.5)


def test_multiplayer_stats():
    info = {
        "FRAGCOUNT": 10.0,
        "DEATHCOUNT": 4.0,
        "PLAYER_COUNT": 3,
        "PLAYER_NUMBER": 0,  # we are PLAYER1_*
        "PLAYER1_FRAGCOUNT": 10,
        "PLAYER2_FRAGCOUNT": 12,
        "PLAYER3_FRAGCOUNT": 3,
    }
    env = MultiplayerStatsWrapper(FakeDoomEnv([(0.0, info)] * 2))
    env.reset()
    _, _, _, _, out = env.step(0)
    assert out["KDR"] == pytest.approx(10.0 / 5.0)
    assert out["FINAL_PLACE"] == 2
    assert out["LEADER_GAP"] == 2  # 12 - 10

    # winner's gap is to the runner-up and non-positive
    winner = dict(info, PLAYER_NUMBER=1, FRAGCOUNT=12.0)
    env = MultiplayerStatsWrapper(FakeDoomEnv([(0.0, winner)] * 2))
    env.reset()
    _, _, _, _, out = env.step(0)
    assert out["FINAL_PLACE"] == 1 and out["LEADER_GAP"] == -2


def test_additional_input_measurements():
    info = {
        "SELECTED_WEAPON": 3.0,
        "SELECTED_WEAPON_AMMO": 150.0,  # scaled /15, capped at 5
        "HEALTH": -10.0,  # clamped to 0
        "ARMOR": 60.0,
        "WEAPON3": 1.0,
        "AMMO3": 30.0,
    }
    env = DoomAdditionalInput(FakeDoomEnv([(0.0, info)] * 3))
    assert isinstance(env.observation_space, gym.spaces.Dict)
    obs, _ = env.reset()
    obs, *_ = env.step(0)
    m = obs["measurements"]
    assert m[0] == 3.0
    assert m[1] == pytest.approx(5.0)  # ammo capped
    assert m[2] == 0.0  # health clamped
    assert m[3] == pytest.approx(2.0)  # armor / 30
    assert m[7 + 3] == 1.0  # WEAPON3
    assert m[7 + 8 + 3] == pytest.approx(2.0)  # AMMO3 / 15


# ---------------------------------------------------------------- generic wrappers


class PixelEnv(gym.Env):
    def __init__(self, shape=(64, 48, 3)):
        self.observation_space = Box(0, 255, shape, dtype=np.uint8)
        self.action_space = Discrete(2)
        self.unwrapped.skip_frames = 1

    def reset(self, *, seed=None, options=None):
        return np.full(self.observation_space.shape, 7, np.uint8), {}

    def step(self, action):
        return np.full(self.observation_space.shape, 7, np.uint8), 2.0, False, False, {}


def test_resize_wrapper():
    env = ResizeWrapper(PixelEnv(), w=32, h=24)
    assert env.observation_space.shape == (24, 32, 3)
    obs, _ = env.reset()
    assert obs.shape == (24, 32, 3) and obs.dtype == np.uint8
    assert np.all(obs == 7)


def test_reward_scaling_wrapper():
    env = RewardScalingWrapper(PixelEnv(), 0.25)
    env.reset()
    _, r, *_ = env.step(0)
    assert r == pytest.approx(0.5)


def test_time_limit_wrapper():
    env = TimeLimitWrapper(PixelEnv(), limit=3)
    env.reset()
    for _ in range(2):
        _, _, term, trunc, info = env.step(0)
        assert not term and not trunc
    _, _, term, trunc, info = env.step(0)
    assert trunc and not term and info.get("time_outs")
    env.reset()
    _, _, _, trunc, _ = env.step(0)
    assert not trunc  # counter reset


# ---------------------------------------------------------------- encoder


def test_vizdoom_encoder_forward():
    import jax
    import jax.numpy as jnp

    from sample_factory_tpu.cfg.arguments import default_cfg
    from sample_factory_tpu.envs.spaces import from_gym_space
    from sf_examples_tpu.vizdoom.doom_model import make_vizdoom_encoder

    from sample_factory_tpu.utils.static_cfg import StaticConfig

    cfg = StaticConfig(default_cfg(env="doom_battle", argv=["--encoder_conv_architecture=convnet_simple"]))
    obs_space = gym.spaces.Dict(
        {
            "obs": Box(0, 255, (72, 128, 3), dtype=np.uint8),
            "measurements": Box(-50.0, 50.0, (23,), dtype=np.float32),
        }
    )
    spec = from_gym_space(obs_space)
    encoder = make_vizdoom_encoder(cfg, spec)
    obs = {
        "obs": jnp.zeros((4, 72, 128, 3), jnp.float32),
        "measurements": jnp.zeros((4, 23), jnp.float32),
    }
    params = encoder.init(jax.random.PRNGKey(0), obs)
    out = encoder.apply(params, obs)
    assert out.shape[0] == 4 and out.ndim == 2


def test_parse_vizdoom_cfg():
    from sf_examples_tpu.vizdoom.train_vizdoom import parse_vizdoom_cfg

    cfg = parse_vizdoom_cfg(argv=["--env=doom_battle", "--experiment=test_doom"])
    # paper-tuned doom defaults applied
    assert cfg.exploration_loss == "symmetric_kl"
    assert cfg.env_frameskip == 4
    assert cfg.res_w == 128 and cfg.res_h == 72
    assert cfg.num_bots == -1


# ------------------------------------------------- periphery (render / play)


def test_tile_grid_layout():
    from sf_examples_tpu.vizdoom.doom.doom_render import as_hwc, tile_grid

    frames = [np.full((8, 10, 3), i, np.uint8) for i in range(5)]
    grid = tile_grid(frames, max_cols=3)
    # 5 frames -> 2 rows x 3 cols with one black pad
    assert grid.shape == (16, 30, 3)
    assert grid[0, 0, 0] == 0 and grid[0, 10, 0] == 1 and grid[0, 20, 0] == 2
    assert grid[8, 0, 0] == 3 and grid[8, 10, 0] == 4
    assert np.all(grid[8:, 20:] == 0)  # pad slot is black

    chw = np.arange(2 * 4 * 6, dtype=np.uint8).reshape(2, 4, 6)
    assert as_hwc(chw).shape == (4, 6, 2)
    hwc = np.zeros((4, 6, 3), np.uint8)
    assert as_hwc(hwc).shape == (4, 6, 3)


def test_step_human_input_advances_engine():
    """StepHumanInput ignores policy actions and drives the env through the
    engine's human/spectator interface (advance_human_or_replay)."""
    from sf_examples_tpu.vizdoom.doom.human_play import StepHumanInput

    class FakeHumanDoom(gym.Env):
        observation_space = Box(0, 255, (8, 8, 3), dtype=np.uint8)
        action_space = Discrete(4)

        def __init__(self):
            self.mode = "player"
            self.initialized = False
            self.advanced = 0
            self.closed = 0

        def _ensure_initialized(self):
            self.initialized = True

        def close(self):
            self.closed += 1

        def reset(self, *, seed=None, options=None):
            return np.zeros((8, 8, 3), np.uint8), {}

        def advance_human_or_replay(self):
            self.advanced += 1
            return np.zeros((8, 8, 3), np.uint8), 1.5, self.advanced >= 3

        def step(self, action):  # pragma: no cover - must NOT be called
            raise AssertionError("policy step() must not drive human mode")

    env = FakeHumanDoom()
    wrapped = StepHumanInput(env)
    wrapped.reset()
    assert env.mode == "human" and env.initialized
    done, total = False, 0.0
    while not done:
        _o, r, done, _t, _i = wrapped.step(0)
        total += r
    assert env.advanced == 3 and total == pytest.approx(4.5)
