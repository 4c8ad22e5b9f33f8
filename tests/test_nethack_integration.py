"""NetHack integration machinery testable without nle: cursor crop math,
TileTTY/PrevActions wrappers over a synthetic tty env, and both policy
encoders (ChaoticDwarvenGPT5, ScaledNet) through the actor-critic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

from sample_factory_tpu.algo.context import global_model_factory, reset_global_context
from sample_factory_tpu.envs.spaces import Box, Discrete, make_dict_spec
from sample_factory_tpu.utils.static_cfg import StaticConfig
from sf_examples_tpu.nethack.models import crop_around_cursor_jax, make_nethack_encoder
from sf_examples_tpu.nethack.wrappers import PrevActionsWrapper, TileTTY, crop_around_cursor

TTY_ROWS, TTY_COLS = 24, 80


@pytest.fixture(autouse=True)
def _fresh_context():
    reset_global_context()
    yield
    reset_global_context()


class FakeTtyEnv(gym.Env):
    """Synthetic NLE-shaped env: tty chars/colors/cursor observations."""

    def __init__(self):
        self.observation_space = gym.spaces.Dict(
            {
                "tty_chars": gym.spaces.Box(0, 255, (TTY_ROWS, TTY_COLS), np.uint8),
                "tty_colors": gym.spaces.Box(0, 31, (TTY_ROWS, TTY_COLS), np.int8),
                "tty_cursor": gym.spaces.Box(0, 255, (2,), np.uint8),
            }
        )
        self.action_space = gym.spaces.Discrete(5)
        self.t = 0

    def _obs(self):
        obs = {
            "tty_chars": np.full((TTY_ROWS, TTY_COLS), 32, np.uint8),
            "tty_colors": np.zeros((TTY_ROWS, TTY_COLS), np.int8),
            "tty_cursor": np.array([12, 40], np.uint8),
        }
        obs["tty_chars"][12, 40] = ord("@")
        return obs

    def reset(self, *, seed=None, options=None):
        self.t = 0
        return self._obs(), {}

    def step(self, action):
        self.t += 1
        return self._obs(), 0.0, self.t >= 8, False, {}


def test_crop_around_cursor_numpy():
    arr = np.arange(24 * 80).reshape(24, 80)
    # interior: crop is exactly centered
    c = crop_around_cursor(arr, (12, 40), 9)
    assert c.shape == (9, 9)
    assert c[4, 4] == arr[12, 40]
    assert (c == arr[8:17, 36:45]).all()
    # corner: out-of-bounds region zero-padded
    c = crop_around_cursor(arr, (0, 0), 9)
    assert c[4, 4] == arr[0, 0]
    assert (c[:4, :] == 0).all() and (c[:, :4] == 0).all()
    # channel dims preserved
    c = crop_around_cursor(np.stack([arr, arr]), (23, 79), 9)
    assert c.shape == (2, 9, 9)
    assert c[0, 4, 4] == arr[23, 79]
    assert (c[:, 5:, :] == 0).all()


def test_crop_jax_matches_numpy():
    rng = np.random.default_rng(0)
    maps = rng.integers(0, 255, (3, 21, 80, 2)).astype(np.float32)
    cursors = np.array([[0, 0], [10, 40], [20, 79]], np.int32)
    out = np.asarray(crop_around_cursor_jax(jnp.asarray(maps), jnp.asarray(cursors), 9))
    for b in range(3):
        # numpy reference crops [H, W] planes; compare per channel
        for ch in range(2):
            expect = crop_around_cursor(maps[b, :, :, ch], cursors[b], 9)
            assert np.allclose(out[b, :, :, ch], expect), f"b={b} ch={ch}"


def test_tile_tty_and_prev_actions():
    env = TileTTY(FakeTtyEnv(), crop_size=12, rescale_font_size=(6, 6))
    env = PrevActionsWrapper(env)
    obs, _ = env.reset()
    assert obs["screen_image"].shape == (72, 72, 2)  # HWC
    assert obs["screen_image"].dtype == np.uint8
    assert obs["prev_actions"][0] == 0
    # np.tile repeats the 12x12 crop pattern 6x6 times (reference tile_tty.py:66
    # semantics): the '@' under the cursor (crop center, (6, 6)) appears at
    # every (12k+6, 12m+6)
    screen = obs["screen_image"][..., 0]
    for k in (0, 3, 5):
        for m in (0, 2, 5):
            assert screen[12 * k + 6, 12 * m + 6] == ord("@")
    assert screen[0, 0] == 32  # background space elsewhere
    obs, *_ = env.step(3)
    assert obs["prev_actions"][0] == 3
    # spaces advertise the added keys
    assert "screen_image" in env.observation_space.spaces
    assert "prev_actions" in env.observation_space.spaces


def _nethack_cfg(**over):
    from sf_examples_tpu.nethack.train_nethack import parse_nethack_args

    argv = ["--env=nethack_score", "--experiment=nh_test"] + [f"--{k}={v}" for k, v in over.items()]
    return StaticConfig(parse_nethack_args(argv))


def _obs_space(num_actions=23):
    return make_dict_spec(
        {
            "tty_chars": Box((TTY_ROWS, TTY_COLS), 0, 255, "uint8"),
            "tty_colors": Box((TTY_ROWS, TTY_COLS), 0, 31, "int8"),
            "tty_cursor": Box((2,), 0, 255, "uint8"),
            "screen_image": Box((108, 108, 2), 0, 255, "uint8"),
            "prev_actions": Box((1,), 0, num_actions, "int32"),
            "message": Box((256,), 0, 255, "uint8"),
            "blstats": Box((27,), -1e9, 1e9, "int64"),
        }
    )


def _synthetic_obs(B=3, num_actions=23):
    rng = np.random.default_rng(1)
    return {
        "tty_chars": jnp.asarray(rng.integers(32, 128, (B, TTY_ROWS, TTY_COLS)), jnp.int32),
        "tty_colors": jnp.asarray(rng.integers(0, 31, (B, TTY_ROWS, TTY_COLS)), jnp.int32),
        "tty_cursor": jnp.asarray(rng.integers(1, 20, (B, 2)), jnp.int32),
        "screen_image": jnp.asarray(rng.integers(0, 255, (B, 108, 108, 2)), jnp.float32),
        "prev_actions": jnp.asarray(rng.integers(0, num_actions, (B, 1)), jnp.int32),
        "message": jnp.asarray(rng.integers(0, 255, (B, 256)), jnp.float32),
        "blstats": jnp.asarray(rng.integers(0, 100, (B, 27)), jnp.float32),
    }


@pytest.mark.parametrize("model", ["ChaoticDwarvenGPT5", "ScaledNet"])
def test_nethack_encoders_forward(model):
    cfg = _nethack_cfg(model=model)
    enc = make_nethack_encoder(cfg, _obs_space())
    obs = _synthetic_obs()
    params = enc.init(jax.random.PRNGKey(0), obs)
    out = enc.apply(params, obs)
    assert out.shape[0] == 3 and out.ndim == 2
    if model == "ScaledNet":
        assert out.shape[1] == cfg.h_dim
    else:
        # topline 128 + bottomline 128 + screen 512 + prev-action one-hot
        assert out.shape[1] == 128 + 128 + 512 + 23
    assert bool(jnp.isfinite(out).all())


def test_nethack_actor_critic_end_to_end():
    from sample_factory_tpu.models.actor_critic import create_actor_critic, initial_actor_critic_state
    from sf_examples_tpu.nethack.models import make_nethack_encoder as factory

    cfg = _nethack_cfg()
    global_model_factory().register_encoder_factory(factory)
    model = create_actor_critic(cfg, _obs_space(), Discrete(23))
    obs = _synthetic_obs(B=2)
    rnn = initial_actor_critic_state(cfg, 2)
    params = model.init(jax.random.PRNGKey(0), obs, rnn)
    ap, v, new_rnn = model.apply(params, obs, rnn)
    assert ap.shape == (2, 23) and v.shape == (2,)
    assert bool(jnp.isfinite(ap).all()) and bool(jnp.isfinite(v).all())
