"""The custom pixel env + custom model example (the reference's
train_custom_env_custom_model harness, sf_examples/train_custom_env_custom_model.py).
Learning-threshold evidence lives in docs/evidence/pixel_host_300k; here we
smoke the example end-to-end (registration, custom encoder factory, batched
host env, train loop) and unit-test the env contract."""

import numpy as np
import pytest

from sample_factory_tpu.algo.context import reset_global_context
from sample_factory_tpu.train import run_rl
from sf_examples_tpu.train_custom_env_custom_model import (
    EPISODE_LEN,
    CustomPixelEnv,
    parse_custom_args,
    register_custom_components,
)


@pytest.fixture(autouse=True)
def _fresh_context():
    reset_global_context()
    yield
    reset_global_context()


def test_env_contract():
    env = CustomPixelEnv(num_envs=4, seed=3)
    obs, _ = env.reset()
    assert obs.shape == (4, 42, 42, 4) and obs.dtype == np.uint8
    # reward is 1 exactly when the action names the lit quadrant
    correct = env.quadrant.copy()
    obs, rew, term, trunc, _ = env.step(correct)
    np.testing.assert_array_equal(rew, 1.0)
    obs, rew, term, trunc, _ = env.step((env.quadrant + 1) % 4)
    np.testing.assert_array_equal(rew, 0.0)
    for _ in range(EPISODE_LEN):
        obs, rew, term, trunc, _ = env.step(np.zeros(4, np.int64))
    assert trunc.any() or term.any() or env.t.max() < EPISODE_LEN  # truncation path exercised


def test_example_trains_smoke(tmp_path):
    register_custom_components()
    cfg = parse_custom_args(
        [
            "--env=my_custom_pixel_env",
            "--experiment=pixel_smoke",
            f"--train_dir={tmp_path}",
            "--device=cpu",
            "--serial_mode=True",
            "--num_workers=1",
            "--num_envs_per_worker=16",
            "--rollout=16",
            "--batch_size=256",
            "--train_for_env_steps=2048",
            "--seed=0",
        ]
    )
    assert run_rl(cfg, register_fn=register_custom_components) == 0
