"""The Runner: host-side orchestration of the fused on-device train loop.

Parity: reference `sample_factory/algo/runners/runner.py` (main event loop,
stats aggregation, periodic checkpoint/summary timers, termination conditions)
plus `runner_serial.py`/`runner_parallel.py`. The TPU architecture collapses
the reference's five component processes (SURVEY.md §7): there are no worker
processes for on-device envs — one jitted `train_iteration` does
rollout(scan over T, vmap over N envs) + learner update, and this host loop
just dispatches iterations, drains scalar stats, and handles
checkpoints/summaries/termination.

Regimes:
  - sync (async_rl=False): rollout with the just-updated params (on-policy)
  - async (async_rl=True): rollout with the previous iteration's param
    snapshot — the honest device analog of APPO's policy-lag regime; the
    version-stamped trajectories flow through the same valids/max_policy_lag
    and V-trace machinery as the reference
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sample_factory_tpu.algo.learning import init_train_state, make_train_fn
from sample_factory_tpu.algo.optimizers import make_optimizer
from sample_factory_tpu.algo.sampling import init_sampler_state, make_rollout_fn
from sample_factory_tpu.envs.device_env import DeviceEnv
from sample_factory_tpu.envs.env_info import EnvInfo, extract_env_info
from sample_factory_tpu.envs.env_utils import create_env
from sample_factory_tpu.models.actor_critic import create_actor_critic
from sample_factory_tpu.parallel.mesh import (
    make_mesh,
    num_data_shards,
    replicate_tree,
    shard_env_axis,
    shard_params_tp,
)
from sample_factory_tpu.runner.checkpoint import load_checkpoint, save_checkpoint
from sample_factory_tpu.runner.stats import EpisodeStats, FpsTracker, SummaryWriter
from sample_factory_tpu.utils.timing import Timing
from sample_factory_tpu.utils.utils import (
    done_filename,
    experiment_dir,
    init_file_logger,
    log,
    save_cfg,
)


class AlgoObserver:
    """User extension hooks on the training loop (reference runner.py:52-73)."""

    def on_init(self, runner) -> None:
        pass

    def on_training_iteration(self, runner, stats) -> None:
        """Called after every training iteration. `stats` is a dict of device
        arrays; in quantized async mode (host envs, --async_rl) it describes
        the PREVIOUS iteration's train step (one-iteration lag inherent to the
        overlap) and is empty ({}) on the very first iteration."""

    def extra_summaries(self, runner, policy_id: int, writer, env_steps: int) -> None:
        """Called at every summary report; write custom scalars to the writer
        (reference runner.py:70-73 AlgoObserver.extra_summaries)."""

    def on_stop(self, runner) -> None:
        pass


class Runner:
    """Single-policy on-device training runner (multi-policy: see MultiPolicyRunner)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.policy_id = 0
        self.timing = Timing("runner")
        self.observers: list = []
        # custom per-episode stats plumbing (reference runner.py episodic-stats
        # handlers + policy_avg_stats used by PBT custom target objectives)
        self.episodic_stats_handlers: list = []
        self.policy_avg_stats: Dict[str, Any] = {}

        self.env: Optional[DeviceEnv] = None
        self.env_info: Optional[EnvInfo] = None
        self.model = None
        self.mesh = None

        self.train_state = None
        self.sampler_state = None
        self.behavior_params = None
        self.behavior_version = None

        self.env_steps = 0
        self.best_performance = -1e9
        self.key = None

        self.episode_stats = EpisodeStats(cfg.stats_avg)
        self.fps_tracker = FpsTracker()
        self.writer: Optional[SummaryWriter] = None

        self._train_iteration = None
        self._last_stats = None
        # episodic stats stay device-side futures until a report needs them:
        # a per-iteration device_get would serialize host and device (and on
        # a tunneled TPU pay a network RTT per iteration — measured 60x FPS
        # loss on fast pixel envs). Bounded so the dispatch queue can't run
        # away from the device.
        self._pending_ep: list = []
        self._max_pending_ep = 32
        self._last_report = 0.0
        self._last_checkpoint = 0.0
        self._last_best_check = 0.0
        self._last_milestone = 0.0
        self._start_time = None
        self._stop_requested = False

    # ------------------------------------------------------------------ init

    def init(self) -> None:
        cfg = self.cfg
        if cfg.restart_behavior == "overwrite":
            import shutil

            shutil.rmtree(experiment_dir(cfg, mkdir=False), ignore_errors=True)

        experiment_dir(cfg)  # create
        init_file_logger(cfg)
        save_cfg(cfg)
        self.writer = SummaryWriter(cfg, self.policy_id)

        from sample_factory_tpu.utils.wandb_utils import init_wandb

        init_wandb(cfg)

        env = create_env(cfg.env, cfg=cfg, env_config=None)
        assert isinstance(env, DeviceEnv), (
            "Runner currently drives on-device envs; host (gymnasium) envs use HostEnvRunner"
        )
        self.env = env
        self.env_info = extract_env_info(env, cfg)

        self.mesh = make_mesh(cfg)
        shards = num_data_shards(self.mesh)
        assert cfg.num_envs % shards == 0, f"num_envs ({cfg.num_envs}) must divide over {shards} data shards"
        log.info(
            "Runner: %d envs, rollout %d, mesh %s, devices %s",
            cfg.num_envs,
            cfg.rollout,
            dict(self.mesh.shape),
            jax.devices()[0].platform,
        )

        self.model = create_actor_critic(cfg, self.env_info.obs_space, self.env_info.action_space)
        tx = make_optimizer(cfg)

        self.key = jax.random.PRNGKey(cfg.seed)
        k_env, k_model, self.key = jax.random.split(self.key, 3)

        sampler_state = init_sampler_state(cfg, env, k_env, cfg.num_envs)
        example_obs = {k: v[:2] for k, v in sampler_state.obs.items()}
        train_state = init_train_state(cfg, self.env_info, self.model, tx, k_model, example_obs)

        # resume from checkpoint (reference learner.py:300)
        restored = load_checkpoint(cfg, self.policy_id, train_state)
        if restored is not None:
            train_state, self.env_steps, self.best_performance = restored

        # place on the mesh: train state replicated over 'data' (wide layers
        # sharded over 'model' when tensor parallelism is on), env/sampler
        # state sharded over 'data'
        if self.mesh.shape["model"] > 1:
            self.train_state = shard_params_tp(train_state, self.mesh, cfg.tp_min_layer_width)
        else:
            self.train_state = replicate_tree(train_state, self.mesh)
        self.sampler_state = shard_env_axis(sampler_state, self.mesh)
        self.behavior_params = self.train_state.params
        self.behavior_version = self.train_state.train_step

        rollout_fn = make_rollout_fn(cfg, env, self.env_info, self.model)
        train_fn = make_train_fn(cfg, self.env_info, self.model, tx, self.policy_id)
        policy_id = self.policy_id

        fused = max(1, int(getattr(cfg, "fused_iterations", 1)))
        if fused > 1 and cfg.async_rl:
            log.warning("--fused_iterations>1 requires sync mode (async policy lag assumes K=1); using 1")
            fused = 1
        self._fused_iterations = fused

        def train_iteration_sync(ts, ss, key):
            """On-policy: rollout with the live params. With
            --fused_iterations=K, K rollout+train cycles run inside this one
            XLA program (lax.scan) and episodic sums accumulate on device —
            zero host dispatch between them."""
            if fused == 1:
                ss, traj, ep_stats = rollout_fn(ts.params, ts.obs_rms, ss, ts.train_step, policy_id)
                ts, stats = train_fn(ts, traj, key)
                return ts, ss, stats, ep_stats

            def body(carry, k):
                ts, ss = carry
                ss, traj, ep_stats = rollout_fn(ts.params, ts.obs_rms, ss, ts.train_step, policy_id)
                ts, stats = train_fn(ts, traj, k)
                return (ts, ss), (stats, ep_stats)

            (ts, ss), (stats_seq, ep_seq) = jax.lax.scan(body, (ts, ss), jax.random.split(key, fused))
            stats = jax.tree.map(lambda x: x[-1], stats_seq)
            ep_stats = jax.tree.map(lambda x: jnp.sum(x, axis=0), ep_seq)
            return ts, ss, stats, ep_stats

        def train_iteration_async(ts, ss, behavior_params, behavior_version, key):
            """Policy-lag regime: rollout with a stale param snapshot.

            ts is not donated here: the snapshot pytree aliases a previous
            iteration's params and XLA forbids reading donated buffers.
            """
            ss, traj, ep_stats = rollout_fn(behavior_params, ts.obs_rms, ss, behavior_version, policy_id)
            ts, stats = train_fn(ts, traj, key)
            return ts, ss, stats, ep_stats

        self._train_iteration_sync = jax.jit(train_iteration_sync, donate_argnums=(0, 1))
        self._train_iteration_async = jax.jit(train_iteration_async, donate_argnums=(1,))

    # ------------------------------------------------------------------- run

    def run(self) -> int:
        cfg = self.cfg
        self._start_time = time.time()
        self._last_report = self._last_checkpoint = self._last_best_check = self._last_milestone = self._start_time
        transitions_per_iter = cfg.num_envs * cfg.rollout * self._fused_iterations
        frameskip = cfg.env_frameskip if cfg.summaries_use_frameskip else 1

        log.info("Starting training for %d env steps (current: %d)", cfg.train_for_env_steps, self.env_steps)
        status = 0
        profiled_iters = 0
        if cfg.profiler_dir:
            jax.profiler.start_trace(cfg.profiler_dir)
        try:
            while not self._should_end_training():
                if cfg.profiler_dir and profiled_iters == 12:
                    # capture the first dozen iterations (incl. compile), then stop
                    jax.profiler.stop_trace()
                    log.info("jax.profiler trace written to %s", cfg.profiler_dir)
                profiled_iters += 1
                self.key, iter_key = jax.random.split(self.key)
                if not cfg.async_rl:
                    ts, ss, stats, ep_stats = self._train_iteration_sync(
                        self.train_state, self.sampler_state, iter_key
                    )
                else:
                    ts, ss, stats, ep_stats = self._train_iteration_async(
                        self.train_state, self.sampler_state, self.behavior_params, self.behavior_version, iter_key
                    )
                    # snapshot for the NEXT rollout -> one-iteration policy lag
                    self.behavior_params = ts.params
                    self.behavior_version = ts.train_step
                self.train_state, self.sampler_state = ts, ss

                self.env_steps += transitions_per_iter * frameskip
                self._process_stats(stats, ep_stats)
                self._periodic_tasks(stats)
                self._notify_observers(stats)
        except KeyboardInterrupt:
            log.info("Interrupted, saving checkpoint...")
            status = 1
        finally:
            if cfg.profiler_dir and profiled_iters <= 12:
                try:
                    jax.profiler.stop_trace()
                except Exception:  # noqa: BLE001 - trace may already be stopped
                    pass
            self._drain_ep_stats()
            self._save(is_final=True)
            if self.writer is not None:
                self.writer.close()
            log.info("Timing: %s", self.timing.flat_str())
        fps = self.fps_tracker.fps(300)
        log.info("Training finished at %d env steps, avg FPS (5min window): %.1f", self.env_steps, fps)
        return status

    def stop(self) -> None:
        self._stop_requested = True

    def register_observer(self, observer: AlgoObserver) -> None:
        self.observers.append(observer)

    def register_episodic_stats_handler(self, fn) -> None:
        """fn(runner, extra_stats: Dict[str, float], policy_id) is called once
        per completed episode that carried `episode_extra_stats` in its final
        info dict (reference Runner.register_episodic_stats_handler)."""
        self.episodic_stats_handlers.append(fn)

    def _dispatch_extra_stats(self, extra_stats_list, policy_id: int) -> None:
        for extras in extra_stats_list:
            for handler in self.episodic_stats_handlers:
                handler(self, extras, policy_id)

    def _notify_observers(self, stats) -> None:
        for obs in self.observers:
            obs.on_training_iteration(self, stats)

    # ------------------------------------------------------------- internals

    def _should_end_training(self) -> bool:
        if self._stop_requested:
            return True
        if self.env_steps >= self.cfg.train_for_env_steps:
            return True
        if time.time() - self._start_time >= self.cfg.train_for_seconds:
            return True
        return False

    def _process_stats(self, stats: Dict[str, Any], ep_stats: Dict[str, Any]) -> None:
        now = time.time()
        self.fps_tracker.add(now, self.env_steps)
        # multihost note: ep_stats are jnp.sums over the GLOBALLY sharded env
        # axis inside the jitted program (algo/sampling.py), so under GSPMD
        # they are already cross-host totals, replicated on every host — no
        # host-side aggregation needed (tested in tests/test_multihost.py);
        # env_steps/fps likewise count global envs (cfg.num_envs is global)
        self._pending_ep.append(ep_stats)
        if len(self._pending_ep) >= self._max_pending_ep:
            self._drain_ep_stats()
        self._last_stats = stats  # device arrays; fetched lazily at report time

    def _drain_ep_stats(self) -> None:
        """Fetch all in-flight episodic stats (device futures) at once."""
        if not self._pending_ep:
            return
        pending, self._pending_ep = self._pending_ep, []
        for ep in jax.device_get(pending):
            self.episode_stats.add_rollout_stats(
                float(ep["count"]), float(ep["return_sum"]), float(ep["len_sum"])
            )

    def _periodic_tasks(self, stats) -> None:
        cfg = self.cfg
        now = time.time()
        if now - self._last_report >= cfg.experiment_summaries_interval:
            self._report(stats)
            self._last_report = now
        if now - self._last_checkpoint >= cfg.save_every_sec:
            self._save()
            self._last_checkpoint = now
        if cfg.save_milestones_sec > 0 and now - self._last_milestone >= cfg.save_milestones_sec:
            self._save(milestone=True)
            self._last_milestone = now
        if now - self._last_best_check >= cfg.save_best_every_sec:
            self._maybe_save_best()
            self._last_best_check = now

    def _report(self, stats) -> None:
        self._drain_ep_stats()
        if stats is None:
            stats = self._last_stats
        host_stats = {} if stats is None else {k: float(v) for k, v in jax.device_get(stats).items()}
        fps10, fps300 = self.fps_tracker.fps(10), self.fps_tracker.fps(300)
        avg_r = self.episode_stats.avg_reward
        avg_len = self.episode_stats.avg_length
        log.info(
            "Fps is (10 sec: %.1f, 5 min: %.1f). Total num frames: %d. Throughput: %d episodes. "
            "Avg episode reward: %s, avg episode len: %s",
            fps10,
            fps300,
            self.env_steps,
            self.episode_stats.total_episodes,
            f"{avg_r:.3f}" if avg_r is not None else "n/a",
            f"{avg_len:.1f}" if avg_len is not None else "n/a",
        )
        scalars = dict(host_stats)
        scalars["fps"] = fps10
        if avg_r is not None:
            scalars["reward"] = avg_r
            scalars["episode_len"] = avg_len
        self.writer.write(self.env_steps, scalars)
        for obs in self.observers:
            obs.extra_summaries(self, self.policy_id, self.writer, self.env_steps)
        self.writer.flush()

    def _save(self, is_final: bool = False, milestone: bool = False) -> None:
        from sample_factory_tpu.parallel.multihost import is_primary_host

        if not is_primary_host():
            return  # shared fs: only host 0 writes checkpoints
        with self.timing.add_time("save"):
            save_checkpoint(
                self.cfg, self.policy_id, self.train_state, self.env_steps, self.best_performance, milestone=milestone
            )
        if is_final:
            with open(done_filename(self.cfg), "w") as f:
                f.write(str(self.env_steps))

    def _maybe_save_best(self) -> None:
        self._drain_ep_stats()
        metric = self.episode_stats.avg_reward
        if metric is None or self.env_steps < self.cfg.save_best_after:
            return
        if metric - self.best_performance > 1e-9:
            self.best_performance = metric
            save_checkpoint(
                self.cfg, self.policy_id, self.train_state, self.env_steps, self.best_performance, is_best=True
            )


def make_runner(cfg) -> Runner:
    return Runner(cfg)
