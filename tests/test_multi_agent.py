"""Multi-agent host envs + multi-policy self-play (modeled on reference
tests/examples/test_example_multi.py)."""

import glob
import json
from os.path import join

import pytest

from sample_factory_tpu.algo.context import reset_global_context
from sample_factory_tpu.train import run_rl
from sf_examples_tpu.train_custom_multi_env import parse_custom_args, register_custom_components


@pytest.fixture(autouse=True)
def _fresh_context():
    reset_global_context()
    register_custom_components()
    yield
    reset_global_context()


def _cfg(tmp_path, experiment, extra=None):
    argv = [
        "--env=my_custom_multi_env_v1",
        f"--experiment={experiment}",
        f"--train_dir={tmp_path}",
        "--seed=5",
        "--device=cpu",
        "--num_policies=2",
        "--num_workers=2",
        "--num_envs_per_worker=8",
        "--rollout=16",
        "--batch_size=256",
        "--learning_rate=1e-3",
        "--train_for_env_steps=350000",
        "--save_every_sec=5",
        "--experiment_summaries_interval=2",
        "--encoder_mlp_layers", "32", "32",
        "--use_rnn=False",
    ] + (extra or [])
    return parse_custom_args(argv)


@pytest.mark.medium
@pytest.mark.parametrize(
    "extra",
    [["--serial_mode=True", "--async_rl=False"], ["--serial_mode=False", "--async_rl=True", "--pbt_mix_policies_in_one_env=True"]],
    ids=["serial_sync", "parallel_async_mixed"],
)
def test_multi_agent_selfplay_learns(tmp_path, extra):
    """2-agent matching game: random ~-8/episode, coordinated = 0. Both
    policies must improve substantially."""
    cfg = _cfg(tmp_path, "ma_test", extra=extra)
    assert run_rl(cfg, register_fn=register_custom_components) == 0

    for p in range(2):
        jsonl = join(str(tmp_path), "ma_test", ".summary", str(p), "summaries.jsonl")
        rewards = [
            json.loads(line)["train/reward"] for line in open(jsonl) if "train/reward" in json.loads(line)
        ]
        assert rewards, f"no rewards for policy {p}"
        # must improve well beyond random play
        assert max(rewards) > -5.0, f"policy {p} did not learn: max reward {max(rewards)}"

    for p in range(2):
        assert glob.glob(join(str(tmp_path), "ma_test", f"checkpoint_p{p}", "checkpoint_*"))
