"""DMLab integration machinery that works without deepmind_lab installed:
instruction tokenization, reward clip, level cache seed allocation, the
instruction-conditioned encoder, task assignment, and DMLab-30
human-normalized scoring (reference tests run the env stack only when the
engine is present; the surrounding machinery is what we can and do test)."""

import math
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sample_factory_tpu.utils.attr_dict import AttrDict
from sf_examples_tpu.dmlab.dmlab30 import (
    DMLAB30,
    DMLAB30_LEVELS,
    DMLAB_MAX_INSTRUCTION_LEN,
    human_normalized_score,
)
from sf_examples_tpu.dmlab.dmlab_env import (
    DMLAB_ENVS,
    dmlab_env_by_name,
    optimistic_asymmetric_clip,
    string_to_hash_bucket,
    task_id_for_env,
    tokenize_instructions,
)
from sf_examples_tpu.dmlab.dmlab_level_cache import DmlabLevelCache


def test_instruction_tokenization():
    t = tokenize_instructions("select the red object")
    assert t.shape == (DMLAB_MAX_INSTRUCTION_LEN,) and t.dtype == np.int32
    assert (t[:4] > 0).all() and (t[4:] == 0).all()
    # deterministic + in vocab range [1, vocab-1] (0 reserved for padding)
    t2 = tokenize_instructions("select the red object")
    assert (t == t2).all()
    assert 1 <= string_to_hash_bucket("watermaze", 1000) <= 999
    # truncation at max length
    long = tokenize_instructions(" ".join(["word"] * 40))
    assert (long > 0).all()
    assert tokenize_instructions(None).sum() == 0


def test_optimistic_asymmetric_clip():
    # positive rewards: pure tanh squeeze re-scaled by 5
    assert optimistic_asymmetric_clip(1.0) == pytest.approx(5 * math.tanh(0.2))
    # negative rewards attenuated 0.3x
    assert optimistic_asymmetric_clip(-1.0) == pytest.approx(5 * 0.3 * math.tanh(-0.2))
    assert optimistic_asymmetric_clip(0.0) == 0.0
    # saturates near +/-5 (and 1.5 for the negative branch)
    assert optimistic_asymmetric_clip(1000.0) == pytest.approx(5.0, abs=1e-3)
    assert optimistic_asymmetric_clip(-1000.0) == pytest.approx(-1.5, abs=1e-3)


def test_env_specs_and_task_assignment():
    names = [s.name for s in DMLAB_ENVS]
    assert "dmlab_30" in names and "dmlab_benchmark" in names
    assert len(dmlab_env_by_name("dmlab_30").levels) == 30
    # fallback: raw level name
    spec = dmlab_env_by_name("dmlab_rooms_watermaze")
    assert spec.levels == ["contributed/dmlab30/rooms_watermaze"]

    cfg = AttrDict(dmlab_one_task_per_worker=False)
    spec30 = dmlab_env_by_name("dmlab_30")
    ids = [task_id_for_env(spec30, {"env_id": i, "worker_index": 0}, cfg) for i in range(60)]
    assert sorted(set(ids)) == list(range(30))  # round-robin covers all tasks
    cfg.dmlab_one_task_per_worker = True
    assert task_id_for_env(spec30, {"env_id": 5, "worker_index": 17}, cfg) == 17


def test_level_cache_seed_allocation(tmp_path):
    cache_dir, exp_dir = str(tmp_path / "cache"), str(tmp_path / "exp")
    import os

    os.makedirs(cache_dir)
    level = "contributed/dmlab30/rooms_keys_doors_puzzle"
    # pre-generate 3 seeds
    with open(os.path.join(cache_dir, f"{level.replace('/', '_')}.seeds"), "w") as f:
        for s, k in [(11, "k11"), (22, "k22"), (33, "k33")]:
            f.write(f"{s} {k}\n")

    cache = DmlabLevelCache(cache_dir, exp_dir, [level])
    got = {cache.get_unused_seed(level) for _ in range(3)}
    assert got == {11, 22, 33}, "pre-generated seeds must be consumed first, each exactly once"
    fresh = cache.get_unused_seed(level)
    assert fresh not in got, "after exhaustion, new random seeds must not repeat used ones"

    # resume: a new cache instance over the same experiment must skip all used seeds
    cache2 = DmlabLevelCache(cache_dir, exp_dir, [level])
    again = cache2.get_unused_seed(level)
    assert again not in got | {fresh}

    # pk3 store roundtrip via the env-facing hooks
    src = tmp_path / "map.pk3"
    src.write_bytes(b"pk3data")
    cache.write(level, fresh, "cachekey1", str(src))
    dst = tmp_path / "restored.pk3"
    assert cache.fetch("cachekey1", str(dst))
    assert dst.read_bytes() == b"pk3data"
    assert not cache.fetch("missing", str(dst))
    # the new seed was recorded as pre-generated for future experiments
    cache3 = DmlabLevelCache(cache_dir, str(tmp_path / "exp2"), [level])
    assert fresh in cache3.available[level]


def _claim_seeds(cache_dir, exp_dir, level, n, q):
    c = DmlabLevelCache(cache_dir, exp_dir, [level])
    q.put([c.get_unused_seed(level) for _ in range(n)])


def test_level_cache_concurrent_claims(tmp_path):
    """Two processes allocating from the same cache never claim the same seed."""
    import multiprocessing as mp

    cache_dir, exp_dir = str(tmp_path / "cache"), str(tmp_path / "exp")
    level = "lvl"

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_claim_seeds, args=(cache_dir, exp_dir, level, 20, q)) for _ in range(2)]
    for p in procs:
        p.start()
    results = [q.get(timeout=60) for _ in procs]
    for p in procs:
        p.join(timeout=30)
    all_seeds = results[0] + results[1]
    assert len(all_seeds) == len(set(all_seeds)), "seed collision across processes"


def _dmlab_cfg(**over):
    from sample_factory_tpu.utils.static_cfg import StaticConfig
    from sf_examples_tpu.dmlab.train_dmlab import parse_dmlab_args

    argv = ["--env=dmlab_30", "--experiment=dm_test"] + [f"--{k}={v}" for k, v in over.items()]
    # models receive the hashable StaticConfig view (as create_actor_critic does)
    return StaticConfig(parse_dmlab_args(argv))


def test_dmlab_encoder_forward():
    from sample_factory_tpu.envs.spaces import Box, make_dict_spec
    from sf_examples_tpu.dmlab.dmlab_model import make_dmlab_encoder

    cfg = _dmlab_cfg()
    obs_space = make_dict_spec({"obs": Box((72, 96, 3)), "INSTR": Box((16,), 0, 1000, "int32")})
    enc = make_dmlab_encoder(cfg, obs_space)

    rng = np.random.default_rng(0)
    B = 4
    tokens = np.zeros((B, 16), np.int32)
    tokens[0, :3] = [5, 9, 2]
    tokens[1, :1] = [7]
    tokens[2] = rng.integers(1, 1000, 16)  # full-length
    # row 3: all padding (empty instruction)
    obs = {
        "obs": jnp.asarray(rng.uniform(0, 1, (B, 72, 96, 3)), jnp.float32),
        "INSTR": jnp.asarray(tokens),
    }
    params = enc.init(jax.random.PRNGKey(0), obs)
    out = enc.apply(params, obs)
    assert out.shape == (B, 512 + 64)  # conv-mlp 512 + instruction LSTM 64
    assert bool(jnp.isfinite(out).all())

    # different instructions -> different embeddings (image part identical)
    instr_part = out[:, 512:]
    assert not np.allclose(np.asarray(instr_part[0]), np.asarray(instr_part[1]))
    # empty instruction contributes a deterministic (length-1-clamped) vector
    out2 = enc.apply(params, obs)
    assert np.allclose(np.asarray(out), np.asarray(out2))


def test_human_normalized_scoring():
    meta = DMLAB30["rooms_watermaze"]
    assert human_normalized_score("rooms_watermaze", meta.human) == pytest.approx(100.0)
    assert human_normalized_score("rooms_watermaze", meta.random) == pytest.approx(0.0)

    # end-to-end through the tracker with a fake runner/writer
    from sf_examples_tpu.dmlab.dmlab_summaries import TARGET_OBJECTIVE_STAT, Dmlab30ScoreTracker

    cfg = AttrDict(env="dmlab_watermaze", num_policies=1)
    tracker = Dmlab30ScoreTracker(cfg)
    runner = AttrDict(policy_avg_stats={})

    class FakeWriter:
        def __init__(self):
            self.scalars = {}

        def add_scalar(self, key, value, env_steps):
            self.scalars[key] = value

    writer = FakeWriter()
    # no data yet -> no summaries
    tracker.extra_summaries(runner, 0, writer, 1000)
    assert not writer.scalars

    raw = meta.random + 0.5 * (meta.human - meta.random)  # exactly 50%
    tracker.on_episode_extra_stats(runner, {"z_00_rooms_watermaze_dmlab_raw_score": raw}, 0)
    tracker.extra_summaries(runner, 0, writer, 2000)
    assert writer.scalars["_dmlab/000_mean_human_norm_score"] == pytest.approx(50.0)
    assert writer.scalars["_dmlab/000_capped_mean_human_norm_score"] == pytest.approx(50.0)
    assert runner.policy_avg_stats[TARGET_OBJECTIVE_STAT][0][-1] == pytest.approx(50.0)
    # accumulators flushed after reporting (IMPALA procedure)
    assert tracker.new_level_returns[0] == {}

    # capping: above-human performance caps at 100 but the uncapped mean doesn't
    tracker.on_episode_extra_stats(runner, {"z_00_rooms_watermaze_dmlab_raw_score": meta.human * 2}, 0)
    tracker.extra_summaries(runner, 0, writer, 3000)
    assert writer.scalars["_dmlab/000_capped_mean_human_norm_score"] == pytest.approx(100.0)
    assert writer.scalars["_dmlab/000_mean_human_norm_score"] > 100.0


def test_dmlab30_table_consistency():
    assert len(DMLAB30_LEVELS) == 30
    for name, meta in DMLAB30.items():
        assert meta.human > meta.random, name
        assert meta.episode_len > 0
