"""Multi-policy population training + PBT (modeled on reference
tests/algo/test_pbt.py: aggressive mutation, assert learning)."""

import numpy as np
import pytest

from sample_factory_tpu.algo.context import reset_global_context
from sample_factory_tpu.train import run_rl
from sf_examples_tpu.train_synthetic import parse_custom_args, register_synthetic_components


@pytest.fixture(autouse=True)
def _fresh_context():
    reset_global_context()
    register_synthetic_components()
    yield
    reset_global_context()


@pytest.mark.medium
def test_population_learns_with_pbt(tmp_path):
    argv = [
        "--env=synthetic_vector_discrete",
        "--experiment=pbt_test",
        f"--train_dir={tmp_path}",
        "--seed=5",
        "--device=cpu",
        "--num_policies=3",
        "--num_workers=4",
        "--num_envs_per_worker=12",
        "--rollout=16",
        "--batch_size=128",
        "--learning_rate=3e-4",
        "--train_for_env_steps=500000",
        "--with_pbt=True",
        "--pbt_start_mutation=100000",
        "--pbt_period_env_steps=50000",
        "--pbt_mutation_rate=0.9",
        "--save_every_sec=5",
        "--experiment_summaries_interval=1",
        "--encoder_mlp_layers", "64", "64",
        "--use_rnn=False",
    ]
    cfg = parse_custom_args(argv)
    assert run_rl(cfg) == 0

    # every policy of the population must have learned the objective
    import glob
    import json
    from os.path import join

    for p in range(3):
        jsonl = join(str(tmp_path), "pbt_test", ".summary", str(p), "summaries.jsonl")
        rewards = []
        with open(jsonl) as f:
            for line in f:
                d = json.loads(line)
                if "train/reward" in d:
                    rewards.append(d["train/reward"])
        assert rewards and max(rewards) > 1.2, f"policy {p} did not learn: {max(rewards) if rewards else None}"

    # per-policy checkpoints exist
    for p in range(3):
        assert glob.glob(join(str(tmp_path), "pbt_test", f"checkpoint_p{p}", "checkpoint_*")), f"no checkpoint for policy {p}"

    # PBT wrote per-policy cfg files
    assert glob.glob(join(str(tmp_path), "pbt_test", "policy_*_cfg.json"))


def test_pbt_weight_replacement_unit():
    """Weight replacement copies rows of the stacked state and bumps train_step."""
    import jax
    import jax.numpy as jnp

    from sample_factory_tpu.cfg.arguments import default_cfg
    from sample_factory_tpu.pbt.pbt import PopulationBasedTraining
    from sample_factory_tpu.algo.learning import PolicyTrainState, default_hparams

    cfg = default_cfg(env="t", argv=["--seed=1", "--with_pbt=True", "--num_policies=3", "--pbt_replace_reward_gap=0.05"])
    P = 3
    params = {"w": jnp.stack([jnp.full((4,), float(p)) for p in range(P)])}
    hp = jax.vmap(lambda _: default_hparams(cfg))(jnp.arange(P))
    ts = PolicyTrainState(
        params=params,
        opt_state={"m": jnp.zeros((P, 4))},
        obs_rms=None,
        returns_rms=None,
        curr_lr=jnp.full((P,), 1e-4),
        train_step=jnp.zeros((P,), jnp.int32),
        hparams=hp,
    )
    pbt = PopulationBasedTraining(cfg, P)
    ts2 = pbt._replace_weights(ts, dst=2, src=0)
    np.testing.assert_allclose(np.asarray(ts2.params["w"][2]), 0.0)
    np.testing.assert_allclose(np.asarray(ts2.params["w"][1]), 1.0)  # untouched
    assert int(ts2.train_step[2]) == cfg.max_policy_lag + 1


def test_device_env_pbt_reward_shaping(tmp_path):
    """PBT reward-shaping mutation on a device env: shaping coefficients are
    runtime scalars in the sampler state (no recompile), mutated rows land in
    policy_XX_reward_shaping.json (reference pbt writes the same files)."""
    import glob
    import json
    from os.path import join

    from sf_examples_tpu.train_synthetic import parse_custom_args as parse_synth

    argv = [
        "--env=grid_battle_small",
        "--experiment=gb_pbt",
        f"--train_dir={tmp_path}",
        "--seed=0",
        "--device=cpu",
        "--num_policies=2",
        "--num_workers=2",
        "--num_envs_per_worker=16",
        "--rollout=16",
        "--batch_size=128",
        "--encoder_conv_architecture=convnet_impala",
        "--encoder_conv_mlp_layers", "32",
        "--use_rnn=False",
        "--train_for_env_steps=40000",
        "--with_pbt=True",
        "--pbt_start_mutation=2000",
        "--pbt_period_env_steps=4000",
        "--pbt_mutation_rate=1.0",
        "--pbt_replace_fraction=0.5",
        "--save_every_sec=5",
    ]
    cfg = parse_synth(argv)
    assert run_rl(cfg) == 0

    shaping_files = glob.glob(join(str(tmp_path), "gb_pbt", "policy_*_reward_shaping.json"))
    assert shaping_files, "PBT never wrote mutated reward shaping for the device env"
    shaping = json.load(open(shaping_files[0]))
    assert set(shaping) == {"kill_reward", "hit_penalty"}
    # with mutation_rate=1.0 some non-protected policy's shaping must have
    # actually moved off the defaults
    mutated = [json.load(open(f)) for f in shaping_files if "policy_00" not in f]
    assert any(s != {"kill_reward": 1.0, "hit_penalty": 0.2} for s in mutated)
