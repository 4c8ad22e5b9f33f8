"""End-to-end training tests: the real runner at miniature scale.

Modeled on reference tests/examples/test_example.py:122-174 — train the full
system on a tiny synthetic env, assert the objective is learned, round-trip
through checkpoint resume and enjoy().
"""

import shutil

import pytest

from sample_factory_tpu.algo.context import reset_global_context
from sample_factory_tpu.cfg.arguments import verify_cfg
from sample_factory_tpu.enjoy import enjoy
from sample_factory_tpu.train import run_rl
from sf_examples_tpu.train_synthetic import parse_custom_args, register_synthetic_components


@pytest.fixture(autouse=True)
def _fresh_context():
    reset_global_context()
    register_synthetic_components()
    yield
    reset_global_context()


def _train_cfg(tmp_path, experiment, env="synthetic_vector_discrete", extra=None):
    argv = [
        f"--env={env}",
        f"--experiment={experiment}",
        f"--train_dir={tmp_path}",
        "--seed=42",
        "--device=cpu",
        "--num_workers=4",
        "--num_envs_per_worker=16",
        "--rollout=16",
        "--batch_size=256",
        "--num_epochs=1",
        "--learning_rate=3e-4",
        "--train_for_env_steps=400000",
        "--save_every_sec=2",
        "--experiment_summaries_interval=1",
        "--save_best_after=5000",
        "--encoder_mlp_layers", "64", "64",
        "--use_rnn=False",
    ] + (extra or [])
    return parse_custom_args(argv)


# two representative configs (sync feed-forward, async V-trace RNN) run in the
# default tier; the full 400k-step sweep is the slow tier (SF_TPU_RUN_SLOW=1)
@pytest.mark.parametrize(
    "env,extra,threshold",
    [
        ("synthetic_vector_discrete", ["--async_rl=False"], 1.3),
        pytest.param("synthetic_vector_discrete", ["--async_rl=True"], 1.3, marks=pytest.mark.slow),
        (
            "synthetic_vector_discrete",
            ["--async_rl=True", "--with_vtrace=True", "--use_rnn=True", "--rnn_size=32", "--recurrence=-1", "--normalize_returns=False"],
            1.2,
        ),
        pytest.param("synthetic_continuous", ["--async_rl=False", "--kl_loss_coeff=0.1"], -0.5, marks=pytest.mark.slow),
        pytest.param("synthetic_tuple", ["--async_rl=False"], -0.2, marks=pytest.mark.slow),
        pytest.param(
            "synthetic_vector_discrete",
            ["--async_rl=False", "--use_rnn=True", "--rnn_type=lstm", "--rnn_size=32", "--rnn_num_layers=2",
             "--recurrence=8", "--actor_critic_share_weights=False"],
            1.2,
            marks=pytest.mark.slow,
        ),
        pytest.param("synthetic_vector_discrete", ["--async_rl=False", "--compute_dtype=bfloat16"], 1.3, marks=pytest.mark.slow),
        # K rollout+train cycles fused into one XLA program (lax.scan);
        # learning and env_steps accounting must be unchanged
        ("synthetic_vector_discrete", ["--async_rl=False", "--fused_iterations=4"], 1.3),
    ],
    ids=["sync", "async", "vtrace_rnn", "continuous", "tuple_actions", "lstm_separate_weights", "bfloat16", "fused_iterations"],
)
def test_learns_objective(tmp_path, env, extra, threshold):
    cfg = _train_cfg(tmp_path, f"e2e_{env}", env=env, extra=extra)
    verify_cfg(cfg)
    status = run_rl(cfg)
    assert status == 0

    eval_cfg = parse_custom_args(
        [f"--env={env}", f"--experiment=e2e_{env}", f"--train_dir={tmp_path}", "--no_render"],
        evaluation=True,
    )
    status, avg_reward = enjoy(eval_cfg, num_episodes=50)
    assert status == 0
    assert avg_reward >= threshold, f"policy did not learn: avg_reward={avg_reward} < {threshold}"


def test_resume_from_checkpoint(tmp_path):
    cfg = _train_cfg(tmp_path, "resume_test", extra=["--train_for_env_steps=60000"])
    assert run_rl(cfg) == 0

    # second run resumes: env_steps continue from the checkpoint
    cfg2 = _train_cfg(tmp_path, "resume_test", extra=["--train_for_env_steps=120000"])
    assert run_rl(cfg2) == 0

    from sample_factory_tpu.utils.utils import done_filename

    with open(done_filename(cfg2)) as f:
        final_steps = int(f.read())
    assert final_steps >= 120000


def test_overwrite_restart(tmp_path):
    cfg = _train_cfg(tmp_path, "ow_test", extra=["--train_for_env_steps=50000"])
    assert run_rl(cfg) == 0
    cfg2 = _train_cfg(
        tmp_path, "ow_test", extra=["--train_for_env_steps=50000", "--restart_behavior=overwrite"]
    )
    assert run_rl(cfg2) == 0
