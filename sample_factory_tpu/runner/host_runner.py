"""Runner for host (gymnasium) environments: CPU env workers + device learner.

The host analog of `Runner` (see runner.py): rollouts come from
HostVectorSampler worker processes through SharedMemory slabs.

Sync mode trains with one fused XLA program after each rollout (on-policy).
Async mode (APPO) is the TPU-native re-expression of the reference's
overlapped architecture (reference docs/06-architecture/overview.md,
inference_worker.py:349-368): the train step is decomposed into learner
quanta (algo/quantized_train.py) that are dispatched into the device-idle
slots between rollout inference steps, paced evenly over the rollout, while
the rollout itself uses the freshest already-materialized param snapshot.
Env workers therefore never wait for training; per-iteration wall clock
approaches max(env time, device time) instead of their sum.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax

from sample_factory_tpu.algo.host_sampling import HostVectorSampler
from sample_factory_tpu.algo.learning import init_train_state, make_train_fn
from sample_factory_tpu.algo.optimizers import make_optimizer
from sample_factory_tpu.envs.env_info import obtain_env_info
from sample_factory_tpu.models.actor_critic import create_actor_critic
from sample_factory_tpu.parallel.multihost import (
    AmortizedEpisodeSums,
    globalize_host_trajectory,
    globalize_replicated,
    is_multihost,
    localize_replicated,
)
from sample_factory_tpu.runner.checkpoint import load_checkpoint
from sample_factory_tpu.runner.runner import Runner
from sample_factory_tpu.runner.stats import SummaryWriter
from sample_factory_tpu.utils.utils import experiment_dir, init_file_logger, log, save_cfg


class _QuantaPacer:
    """Paces learner-quantum dispatch evenly over a rollout's idle slots.

    With Q pending quanta and S slots, slot i dispatches up to ceil(Q*i/S)
    cumulative quanta — one per slot when Q <= S, bursts when the train step
    is bigger than the rollout's slot count (large num_epochs / many
    minibatches), so the full step is always in flight by rollout end.
    """

    def __init__(self, quantizer, slots: int):
        self.q = quantizer
        self.slots = max(1, slots)
        self.total = 0
        self.i = 0

    def reset(self) -> None:
        self.total = self.q.pending
        self.i = 0

    def __call__(self) -> None:
        self.i += 1
        target = min(self.total, -(-self.total * self.i // self.slots))  # ceil
        while (self.total - self.q.pending) < target:
            if not self.q.dispatch_one():
                break


class HostEnvRunner(Runner):
    def __init__(self, cfg, register_fn: Optional[Callable] = None):
        super().__init__(cfg)
        self.register_fn = register_fn
        self.sampler: Optional[HostVectorSampler] = None
        self._train_jit = None

    def init(self) -> None:
        cfg = self.cfg
        if cfg.restart_behavior == "overwrite":
            import shutil

            shutil.rmtree(experiment_dir(cfg, mkdir=False), ignore_errors=True)
        experiment_dir(cfg)
        init_file_logger(cfg)
        save_cfg(cfg)
        self.writer = SummaryWriter(cfg, self.policy_id)

        from sample_factory_tpu.utils.wandb_utils import init_wandb

        init_wandb(cfg)

        # multihost (SURVEY §7 stage 6): every process runs its own local
        # sampler shard; local trajectories join ONE global-mesh batch for a
        # single SPMD train step (see run()). Env seeding decorrelates per
        # host; model seeds stay identical so params init the same everywhere.
        self._mh = is_multihost()
        self._ep_agg = AmortizedEpisodeSums()
        self.mesh = None
        if self._mh:
            from sample_factory_tpu.parallel.mesh import make_mesh

            cfg.env_seed_offset = jax.process_index() * 1000003
            self.mesh = make_mesh(cfg)
            log.info(
                "Multihost host-env pipeline: process %d/%d, global mesh %s",
                jax.process_index(), jax.process_count(), dict(self.mesh.shape),
            )

        self.env_info = obtain_env_info(cfg, register_fn=self.register_fn)
        assert not self.env_info.is_device_env

        self.model = create_actor_critic(cfg, self.env_info.obs_space, self.env_info.action_space)
        tx = make_optimizer(cfg)
        self.key = jax.random.PRNGKey(cfg.seed)
        k_model, self.key = jax.random.split(self.key)

        self.sampler = HostVectorSampler(cfg, self.env_info, self.model, register_fn=self.register_fn)
        # keep cfg.num_envs consistent with the actual host vector size
        cfg.num_envs = self.sampler.num_envs
        self.sampler.start()

        example_obs = {k: jax.numpy.asarray(v[:2]) for k, v in self.sampler._split_obs(0).items()}
        train_state = init_train_state(cfg, self.env_info, self.model, tx, k_model, example_obs)
        restored = load_checkpoint(cfg, self.policy_id, train_state)
        if restored is not None:
            train_state, self.env_steps, self.best_performance = restored
        # inference (sampler) always runs on process-LOCAL params; training on
        # the global mesh (globalize is a no-op single-host)
        self.behavior_params = train_state.params
        self.behavior_obs_rms = train_state.obs_rms
        self._behavior_version_host = int(jax.device_get(train_state.train_step))
        self._version_host = self._behavior_version_host
        self.train_state = globalize_replicated(train_state, self.mesh) if self._mh else train_state

        train_fn = make_train_fn(cfg, self.env_info, self.model, tx, self.policy_id)
        self._train_jit = jax.jit(train_fn)
        # async mode trains through the quantized scheduler: learner quanta are
        # dispatched into the device-idle slots between inference steps so env
        # workers never wait for training (see algo/quantized_train.py)
        self._quantizer = None
        if cfg.async_rl:
            from sample_factory_tpu.algo.quantized_train import QuantizedTrainer

            self._quantizer = QuantizedTrainer(
                cfg, self.env_info, self.model, tx, self.policy_id, num_envs=self.sampler.num_envs
            )
            self._pacer = _QuantaPacer(self._quantizer, slots=cfg.rollout * cfg.worker_num_splits)
        log.info(
            "HostEnvRunner: %d workers x %d envs (%d total), serial=%s, async=%s",
            cfg.num_workers,
            cfg.num_envs_per_worker,
            self.sampler.num_envs,
            cfg.serial_mode,
            cfg.async_rl,
        )

    def _local(self, tree):
        """Global replicated arrays -> process-local (sampler inference)."""
        return localize_replicated(tree, self.mesh) if self._mh else tree

    def run(self) -> int:
        cfg = self.cfg
        self._start_time = time.time()
        self._last_report = self._last_checkpoint = self._last_best_check = self._last_milestone = self._start_time
        # env_steps count GLOBAL experience: all processes' samplers feed the
        # one SPMD train step
        transitions_per_iter = self.sampler.num_envs * cfg.rollout * jax.process_count()
        frameskip = cfg.env_frameskip if cfg.summaries_use_frameskip else 1

        log.info("Starting training for %d env steps (current: %d)", cfg.train_for_env_steps, self.env_steps)
        use_quanta = self._quantizer is not None
        pending = False
        status = 0
        try:
            while not self._should_end_training():
                self.key, k_collect, k_train = jax.random.split(self.key, 3)
                # k_train must stay IDENTICAL across hosts (input to the one
                # SPMD train program); only the collection key decorrelates
                if self._mh:
                    k_collect = jax.random.fold_in(k_collect, jax.process_index())
                if cfg.async_rl:
                    # behavior snapshot: the freshest params that are already
                    # materialized — the rollout never blocks on an in-flight
                    # train step (the reference's opportunistic weight refresh,
                    # inference_worker.py:349-368)
                    behavior_params, behavior_obs_rms = self.behavior_params, self.behavior_obs_rms
                    behavior_version = self._behavior_version_host
                else:
                    behavior_params = self._local(self.train_state.params)
                    behavior_obs_rms = self._local(self.train_state.obs_rms)
                    behavior_version = int(jax.device_get(self.train_state.train_step))

                idle_fn = self._pacer if (use_quanta and pending) else None
                with self.timing.add_time("rollout"):
                    traj, ep_stats = self.sampler.collect_rollout(
                        behavior_params, behavior_obs_rms, k_collect, behavior_version, self.policy_id,
                        idle_fn=idle_fn,
                    )
                if self._mh:
                    # local shard -> one global batch sharded over 'data'
                    # (metadata-only); host-local episode sums -> global sums,
                    # amortized: the collective+barrier runs every few
                    # iterations, not on every critical-path pass
                    with self.timing.add_time("globalize"):
                        traj = globalize_host_trajectory(traj, self.mesh)
                        ep_stats = self._ep_agg.add(ep_stats)

                stats = None
                if use_quanta:
                    if pending:
                        with self.timing.add_time("train_flush"):
                            self.train_state, stats = self._quantizer.flush()
                        # epoch early-stop skipped sgd quanta: re-sync the host
                        # version mirror with the device train_step (the one
                        # rollout stamped before this correction reads as
                        # negative lag, which the max_policy_lag check treats
                        # as fresh — the safe direction)
                        self._version_host -= self._quantizer.last_skipped_sgd_steps
                    # next rollout's behavior: the params the train step we are
                    # about to enqueue will consume — produced by the previous
                    # train step, whose quanta already ran during this rollout
                    self.behavior_params = self._local(self.train_state.params)
                    self.behavior_obs_rms = self._local(self.train_state.obs_rms)
                    self._behavior_version_host = self._version_host
                    with self.timing.add_time("train_dispatch"):
                        self._quantizer.enqueue(self.train_state, traj, k_train)
                    self._pacer.reset()
                    self._version_host += self._quantizer.sgd_steps_per_train
                    pending = True
                else:
                    with self.timing.add_time("train_dispatch"):
                        ts, stats = self._train_jit(self.train_state, traj, k_train)
                    if cfg.async_rl:
                        # fused fallback (shuffle_minibatches): snapshot = the
                        # params this train step consumed (already materialized)
                        self.behavior_params = self._local(self.train_state.params)
                        self.behavior_obs_rms = self._local(self.train_state.obs_rms)
                        self._behavior_version_host = int(jax.device_get(self.train_state.train_step))
                    self.train_state = ts

                self.env_steps += transitions_per_iter * frameskip
                self._process_stats(stats, ep_stats)
                self._periodic_tasks(stats if stats is not None else self._last_stats)
                # quantized async: flush() stats describe the PREVIOUS
                # iteration's train step (one-iteration stats lag, inherent to
                # the overlap); on the first iteration there are none yet —
                # observers always get a dict of device arrays, never None
                self._notify_observers(stats if stats is not None else (self._last_stats or {}))
            # clean exit: deliver the trailing (< every) amortized episode
            # sums so short runs and run tails aren't dropped from the windows
            if self._mh:
                tail = self._ep_agg.flush()
                if tail is not None:
                    self.episode_stats.add_rollout_stats(
                        tail.get("count", 0.0), tail.get("return_sum", 0.0), tail.get("len_sum", 0.0)
                    )
        except KeyboardInterrupt:
            log.info("Interrupted, saving checkpoint...")
            status = 1
        finally:
            if use_quanta and pending:
                self.train_state, _ = self._quantizer.flush()
            self._save(is_final=True)
            if self.sampler is not None:
                self.sampler.close()
            if self.writer is not None:
                self.writer.close()
            log.info("Timing: %s", self.timing.flat_str())
        log.info("Training finished at %d env steps, avg FPS (5min): %.1f", self.env_steps, self.fps_tracker.fps(300))
        return status

    def _process_stats(self, stats, ep_stats) -> None:
        now = time.time()
        self.fps_tracker.add(now, self.env_steps)
        self.episode_stats.add_rollout_stats(ep_stats["count"], ep_stats["return_sum"], ep_stats["len_sum"])
        extras = ep_stats.get("extra_stats")
        if extras and self.episodic_stats_handlers:
            self._dispatch_extra_stats(extras, self.policy_id)
        if stats is not None:
            self._last_stats = stats
