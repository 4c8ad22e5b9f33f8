"""Two-process jax.distributed test of the HOST-ENV (CPU env) pipeline.

SURVEY §7 stage 6 / BASELINE north star: per-host samplers feeding ONE
global-mesh learner. Each process steps its own gymnasium envs (different
episodes via env_seed_offset), the local trajectories join one global batch
sharded over 'data' (multihost.globalize_host_trajectory), a single SPMD
train step consumes it (gradients all-reduce automatically), and host-local
episode stats are all-reduced (aggregate_episode_sums) so every host reports
GLOBAL numbers. The reference has no such runtime at all (its multi-machine
story is whole-experiment SLURM parallelism).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.medium  # multi-process / long-running tier

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys
port, pid, train_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 4

import numpy as np

from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args
from sample_factory_tpu.runner.host_runner import HostEnvRunner
from sample_factory_tpu.runner.runner import AlgoObserver


def register():
    import gymnasium as gym
    import numpy as np

    from sample_factory_tpu.envs.env_utils import register_env

    class TinyEnv(gym.Env):
        observation_space = gym.spaces.Box(-10, 10, (6,), np.float32)
        action_space = gym.spaces.Discrete(3)

        def __init__(self):
            self.rng = None
            self.t = 0

        def reset(self, seed=None, options=None):
            if seed is not None or self.rng is None:
                self.rng = np.random.default_rng(seed if seed is not None else 0)
            self.t = 0
            return self.rng.normal(size=6).astype(np.float32), {}

        def step(self, a):
            self.t += 1
            obs = self.rng.normal(size=6).astype(np.float32)
            return obs, float(a), self.t >= 12, False, {}

    register_env("tiny_env", lambda name, cfg, env_config, render_mode=None: TinyEnv())


argv = [
    "--env=tiny_env",
    "--experiment=mh_host",
    f"--train_dir={train_dir}",
    "--device=cpu",
    "--serial_mode=True",
    "--num_workers=2",
    "--num_envs_per_worker=4",
    "--worker_num_splits=2",
    "--rollout=8",
    "--batch_size=64",
    "--num_epochs=1",
    "--use_rnn=False",
    "--encoder_mlp_layers", "16", "16",
    "--train_for_env_steps=999999999",
    "--async_rl=False",
    "--seed=11",
    "--experiment_summaries_interval=10000",
    "--save_every_sec=10000",
    "--decorrelate_envs_on_one_worker=False",
]
parser, _ = parse_sf_args(argv=argv)
cfg = parse_full_cfg(parser, argv=argv)

out = {"pid": pid}


class Capture(AlgoObserver):
    def __init__(self):
        self.losses = []

    def on_training_iteration(self, runner, stats) -> None:
        if stats:
            self.losses.append(round(float(jax.device_get(stats["loss"])), 6))
        if len(self.losses) >= 4:
            runner.stop()


register()
runner = HostEnvRunner(cfg, register_fn=register)
runner.init()
out["env_seed_offset"] = getattr(cfg, "env_seed_offset", 0)
# local sampler shards must see DIFFERENT episodes
out["obs_checksum"] = round(float(np.sum(runner.sampler._split_obs(0)["obs"])), 4)
cap = Capture()
runner.register_observer(cap)
runner.run()
out["losses"] = cap.losses
out["env_steps"] = runner.env_steps
out["episodes"] = runner.episode_stats.total_episodes
out["avg_reward"] = round(runner.episode_stats.avg_reward or 0.0, 4)
# 2 workers x 4 envs x 8 rollout x 2 processes = 128 global transitions/iter
out["transitions_expected"] = 2 * 4 * 8 * 2

import glob
from os.path import join

out["ckpt_files"] = len(glob.glob(join(train_dir, "mh_host", "checkpoint_p0", "*.msgpack")))
out["summary_files"] = len(glob.glob(join(train_dir, "mh_host", ".summary", "0", "summaries.jsonl")))

# ---- multi-policy host runner over the same cluster (population SPMD step)
from sample_factory_tpu.runner.host_multi_policy_runner import HostMultiPolicyRunner

argv2 = [a for a in argv if not a.startswith("--experiment")] + [
    "--experiment=mh_host_mp",
    "--num_policies=2",
]
parser2, _ = parse_sf_args(argv=argv2)
cfg2 = parse_full_cfg(parser2, argv=argv2)


class CaptureMP(AlgoObserver):
    def __init__(self):
        self.losses = []

    def on_training_iteration(self, runner, stats) -> None:
        if stats:
            self.losses.append([round(float(x), 6) for x in np.asarray(jax.device_get(stats["loss"]))])
        if len(self.losses) >= 3:
            runner.stop()


runner2 = HostMultiPolicyRunner(cfg2, register_fn=register)
runner2.init()
cap2 = CaptureMP()
runner2.register_observer(cap2)
runner2.run()
out["mp_losses"] = cap2.losses
out["mp_episodes"] = [es.total_episodes for es in runner2.episode_stats_per_policy]

print("MHRESULT " + json.dumps(out), flush=True)
jax.distributed.shutdown()
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def mh_results(tmp_path_factory):
    port = _free_port()
    script = tmp_path_factory.mktemp("mh_host") / "child.py"
    script.write_text(CHILD)
    train_dir = str(tmp_path_factory.mktemp("train"))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2 --xla_backend_optimization_level=1"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(i), train_dir],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(REPO),
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    results = {}
    for i, out in enumerate(outs):
        assert procs[i].returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("MHRESULT ")]
        assert line, f"proc {i} produced no result:\n{out[-4000:]}"
        results[i] = json.loads(line[-1][len("MHRESULT "):])
    return results


def test_local_samplers_decorrelated(mh_results):
    r0, r1 = mh_results[0], mh_results[1]
    assert r0["env_seed_offset"] == 0 and r1["env_seed_offset"] == 1000003
    assert r0["obs_checksum"] != r1["obs_checksum"], "hosts sampled identical episodes"


def test_one_global_train_step(mh_results):
    """The SPMD train step consumed BOTH hosts' shards: replicated outputs
    (losses) are bit-identical on every host, and env_steps count global
    experience."""
    r0, r1 = mh_results[0], mh_results[1]
    assert len(r0["losses"]) >= 4
    assert r0["losses"] == r1["losses"]
    per_iter = r0["transitions_expected"]
    assert r0["env_steps"] % per_iter == 0 and r0["env_steps"] >= 4 * per_iter
    assert r0["env_steps"] == r1["env_steps"]


def test_episode_stats_globally_aggregated(mh_results):
    """aggregate_episode_sums: every host reports the same GLOBAL episode
    totals (this is what makes runner/stats.py's writer gating sound)."""
    r0, r1 = mh_results[0], mh_results[1]
    assert r0["episodes"] == r1["episodes"] and r0["episodes"] > 0
    assert r0["avg_reward"] == r1["avg_reward"]


def test_only_primary_writes(mh_results):
    r0, r1 = mh_results[0], mh_results[1]
    # both processes see host 0's files on the shared fs; the point is host 1
    # created none of its own beyond them (same counts, written once)
    assert r0["ckpt_files"] >= 1
    assert r0["summary_files"] == 1


def test_multi_policy_population_step(mh_results):
    """HostMultiPolicyRunner over the same cluster: per-policy losses of the
    global population train step are identical on every host, and both hosts
    see the same (globally aggregated) per-policy episode counts."""
    r0, r1 = mh_results[0], mh_results[1]
    assert len(r0["mp_losses"]) >= 3 and all(len(row) == 2 for row in r0["mp_losses"])
    assert r0["mp_losses"] == r1["mp_losses"]
    assert r0["mp_episodes"] == r1["mp_episodes"]
