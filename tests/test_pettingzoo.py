"""PettingZoo adapter through the real multi-agent training pipeline."""

import pytest

pytest.importorskip("pettingzoo")

from sample_factory_tpu.algo.context import reset_global_context
from sample_factory_tpu.envs.env_utils import register_env
from sample_factory_tpu.envs.pettingzoo_adapter import make_pettingzoo_env
from sample_factory_tpu.train import run_rl


def _make_rps(full_env_name, cfg=None, env_config=None, render_mode=None):
    return make_pettingzoo_env("pettingzoo.classic.rps_v2", parallel=False)


def register_rps():
    register_env("pz_rps", _make_rps)


def test_adapter_contract():
    env = _make_rps("pz_rps")
    assert env.num_agents == 2 and env.is_multiagent
    obs, infos = env.reset(seed=1)
    assert len(obs) == 2 and obs[0].shape == (4,)
    obs, rewards, terms, truncs, infos = env.step([0, 1])
    assert len(rewards) == 2
    # rock loses to paper
    assert rewards[0] == -1.0 and rewards[1] == 1.0
    assert all(i["is_active"] for i in infos)
    env.close()


def test_rps_trains_through_pipeline(tmp_path):
    """Zero-sum RPS: self-play with 2 policies must run end to end (Nash is
    uniform; we assert the machinery, not an exploitability target)."""
    from sf_examples_tpu.train_gym_env import parse_gym_args

    reset_global_context()
    register_rps()
    argv = [
        "--env=pz_rps",
        "--experiment=rps",
        f"--train_dir={tmp_path}",
        "--seed=1",
        "--device=cpu",
        "--num_policies=2",
        "--serial_mode=True",
        "--async_rl=False",
        "--num_workers=2",
        "--num_envs_per_worker=8",
        "--rollout=16",
        "--batch_size=256",
        "--train_for_env_steps=30000",
        "--encoder_mlp_layers", "32",
        "--use_rnn=False",
        "--save_every_sec=5",
    ]
    cfg = parse_gym_args(argv)
    assert run_rl(cfg, register_fn=register_rps) == 0
    reset_global_context()


def test_tictactoe_example_train_enjoy(tmp_path):
    """The turn-based classic example (custom conv encoder registered via the
    model factory) trains and round-trips through enjoy()."""
    from sample_factory_tpu.enjoy import enjoy
    from sf_examples_tpu.train_pettingzoo_env import parse_custom_args, register_custom_components

    reset_global_context()
    register_custom_components()
    argv = [
        "--env=tictactoe_v3",
        "--experiment=ttt",
        f"--train_dir={tmp_path}",
        "--seed=0",
        "--device=cpu",
        "--num_workers=2",
        "--num_envs_per_worker=4",
        "--batch_size=256",
        "--train_for_env_steps=4000",
        "--save_every_sec=5",
    ]
    cfg = parse_custom_args(argv)
    assert run_rl(cfg, register_fn=register_custom_components) == 0

    eval_cfg = parse_custom_args(argv + ["--no_render", "--max_num_episodes=3"], evaluation=True)
    status, _ = enjoy(eval_cfg)
    assert status == 0
    reset_global_context()
