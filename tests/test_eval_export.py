"""Fast eval (CSV) and model export (StableHLO) round trips."""

import glob
from os.path import join

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sample_factory_tpu.algo.context import reset_global_context
from sample_factory_tpu.eval import do_eval
from sample_factory_tpu.export_model import export_model, load_exported_model
from sample_factory_tpu.train import run_rl
from sf_examples_tpu.train_synthetic import parse_custom_args, register_synthetic_components


@pytest.fixture(autouse=True)
def _fresh_context():
    reset_global_context()
    register_synthetic_components()
    yield
    reset_global_context()


@pytest.fixture(scope="module")
def trained_experiment(tmp_path_factory):
    reset_global_context()
    register_synthetic_components()
    tmp_path = tmp_path_factory.mktemp("eval_export")
    argv = [
        "--env=synthetic_vector_discrete",
        "--experiment=ee1",
        f"--train_dir={tmp_path}",
        "--seed=2",
        "--device=cpu",
        "--num_workers=2",
        "--num_envs_per_worker=8",
        "--rollout=16",
        "--batch_size=128",
        "--train_for_env_steps=30000",
        "--encoder_mlp_layers", "32",
        "--use_rnn=False",
        "--save_every_sec=2",
    ]
    cfg = parse_custom_args(argv)
    assert run_rl(cfg) == 0
    return tmp_path


def test_do_eval_writes_csv(trained_experiment):
    argv = [
        "--env=synthetic_vector_discrete",
        "--experiment=ee1",
        f"--train_dir={trained_experiment}",
        "--sample_env_episodes=16",
    ]
    cfg = parse_custom_args(argv, evaluation=True)
    assert do_eval(cfg) == 0
    csvs = glob.glob(join(str(trained_experiment), "ee1", "eval", "*.csv"))
    assert csvs
    with open(csvs[0]) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "episode,reward,length"
    assert len(lines) >= 2


def test_export_and_reload(trained_experiment):
    argv = [
        "--env=synthetic_vector_discrete",
        "--experiment=ee1",
        f"--train_dir={trained_experiment}",
        "--eval_deterministic=True",
    ]
    cfg = parse_custom_args(argv, evaluation=True)
    path = export_model(cfg, batch_size=4)
    assert path.endswith(".stablehlo")

    infer = load_exported_model(path)
    obs = {"obs": jnp.ones((4, 8), jnp.float32) * 0.5}
    rnn = jnp.zeros((4, 1), jnp.float32)
    actions, new_rnn = infer(obs, rnn, jax.random.PRNGKey(0))
    assert actions.shape == (4, 1)
    assert 0 <= int(np.asarray(actions).min()) and int(np.asarray(actions).max()) < 10


def test_export_tf_saved_model(trained_experiment):
    """ONNX interop path: jax2tf SavedModel export round-trips under TF.
    (The final SavedModel->ONNX step needs tf2onnx, documented in
    docs/migration.md; not installable in this image.)"""
    tf = pytest.importorskip("tensorflow")

    from sample_factory_tpu.export_model import export_tf_saved_model

    argv = [
        "--env=synthetic_vector_discrete",
        "--experiment=ee1",
        f"--train_dir={trained_experiment}",
    ]
    cfg = parse_custom_args(argv, evaluation=True)
    path = export_tf_saved_model(cfg, batch_size=4)

    loaded = tf.saved_model.load(path)
    obs = {"obs": tf.ones((4, 8), tf.float32) * 0.5}
    rnn = tf.zeros((4, 1), tf.float32)
    actions, new_rnn = loaded.infer(obs, rnn)
    assert tuple(actions.shape) == (4, 1)
    a = actions.numpy()
    assert 0 <= a.min() and a.max() < 10
