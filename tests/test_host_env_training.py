"""Host-env (gymnasium) pipeline end-to-end: worker processes + SharedMemory
slabs + device learner, serial and parallel modes (the analog of reference
tests/examples/test_example.py's serial_mode sweep)."""

import functools

import pytest

gym = pytest.importorskip("gymnasium")

from sample_factory_tpu.algo.context import reset_global_context
from sample_factory_tpu.train import run_rl
from sf_examples_tpu.train_gym_env import parse_gym_args, register_gym_env


@pytest.fixture(autouse=True)
def _fresh_context():
    reset_global_context()
    yield
    reset_global_context()


def _cfg(tmp_path, experiment, extra=None):
    argv = [
        "--env=CartPole-v1",
        f"--experiment={experiment}",
        f"--train_dir={tmp_path}",
        "--seed=11",
        "--device=cpu",
        "--num_workers=2",
        "--num_envs_per_worker=8",
        "--worker_num_splits=2",
        "--rollout=32",
        "--batch_size=256",
        "--learning_rate=3e-4",
        "--train_for_env_steps=120000",
        "--save_every_sec=5",
        "--experiment_summaries_interval=2",
        "--encoder_mlp_layers", "64", "64",
        "--use_rnn=False",
    ] + (extra or [])
    return parse_gym_args(argv)


@pytest.mark.medium
@pytest.mark.parametrize(
    "extra",
    [["--serial_mode=True", "--async_rl=False"], ["--serial_mode=False", "--async_rl=True"]],
    ids=["serial_sync", "parallel_async"],
)
def test_cartpole_learns(tmp_path, extra):
    cfg = _cfg(tmp_path, f"cartpole_{extra[0][-4:]}", extra=extra)
    register_fn = functools.partial(register_gym_env, cfg.env)
    register_fn()
    status = run_rl(cfg, register_fn=register_fn)
    assert status == 0

    # read the final reward from summaries
    import glob
    import json
    from os.path import join

    jsonl = glob.glob(join(str(tmp_path), f"cartpole_{extra[0][-4:]}", ".summary", "0", "summaries.jsonl"))[0]
    rewards = []
    with open(jsonl) as f:
        for line in f:
            d = json.loads(line)
            if "train/reward" in d:
                rewards.append(d["train/reward"])
    assert rewards, "no reward summaries written"
    # CartPole random ~20; must have learned substantially by 120k steps
    assert max(rewards) > 100, f"did not learn: max reward {max(rewards)}"
