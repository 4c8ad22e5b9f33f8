"""Multi-policy self-play on host (gymnasium) envs: the APPO marquee regime.

Combines the host sampler's mixed-policy collection (P-way forward + per-slot
selection, `algo/host_sampling.py`) with the stacked-population learner and
PBT (`runner/multi_policy_runner.py`, `pbt/pbt.py`). Each policy's vmapped
train step consumes the full trajectory batch and masks to its own agents via
the valids machinery — mid-episode policy changes and inactive agents are
handled exactly like the reference (non_batched_sampling.py:259-276, masking
in learner.py:949-955).
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sample_factory_tpu.algo.agent_policy_mapping import AgentPolicyMapping
from sample_factory_tpu.algo.host_sampling import HostVectorSampler
from sample_factory_tpu.algo.learning import init_train_state, make_train_fn
from sample_factory_tpu.algo.optimizers import make_optimizer
from sample_factory_tpu.envs.env_info import obtain_env_info
from sample_factory_tpu.models.actor_critic import create_actor_critic
from sample_factory_tpu.pbt.pbt import PopulationBasedTraining
from sample_factory_tpu.runner.checkpoint import load_checkpoint, save_checkpoint
from sample_factory_tpu.runner.multi_policy_runner import MultiPolicyRunner, _unstack
from sample_factory_tpu.runner.stats import EpisodeStats, SummaryWriter
from sample_factory_tpu.utils.utils import done_filename, experiment_dir, init_file_logger, log, save_cfg


class HostMultiPolicyRunner(MultiPolicyRunner):
    def __init__(self, cfg, register_fn: Optional[Callable] = None):
        super().__init__(cfg)
        self.register_fn = register_fn
        self.sampler: Optional[HostVectorSampler] = None
        self.mapping: Optional[AgentPolicyMapping] = None
        self.slot_policies = None  # [K, split_size]

    def init(self) -> None:
        cfg = self.cfg
        if cfg.restart_behavior == "overwrite":
            import shutil

            shutil.rmtree(experiment_dir(cfg, mkdir=False), ignore_errors=True)
        experiment_dir(cfg)
        init_file_logger(cfg)
        save_cfg(cfg)
        self.writers = [SummaryWriter(cfg, p) for p in range(self.P)]
        self.writer = self.writers[0]

        # multihost: per-process sampler shards + one global SPMD population
        # train step (same design as HostEnvRunner)
        from sample_factory_tpu.parallel.multihost import AmortizedEpisodeSums, is_multihost

        self._mh = is_multihost()
        self._ep_agg = AmortizedEpisodeSums()
        self.mesh = None
        if self._mh:
            from sample_factory_tpu.parallel.mesh import make_mesh

            cfg.env_seed_offset = jax.process_index() * 1000003
            self.mesh = make_mesh(cfg)
            log.info(
                "Multihost self-play pipeline: process %d/%d, global mesh %s",
                jax.process_index(), jax.process_count(), dict(self.mesh.shape),
            )

        self.env_info = obtain_env_info(cfg, register_fn=self.register_fn)
        assert not self.env_info.is_device_env

        self.model = create_actor_critic(cfg, self.env_info.obs_space, self.env_info.action_space)
        tx = make_optimizer(cfg)
        self.key = jax.random.PRNGKey(cfg.seed)
        model_keys = jax.random.split(jax.random.fold_in(self.key, 2), self.P)

        self.sampler = HostVectorSampler(cfg, self.env_info, self.model, register_fn=self.register_fn)
        cfg.num_envs = self.sampler.num_envs
        self.sampler.start()

        self.mapping = AgentPolicyMapping(cfg, self.env_info)
        base = self.mapping.initial_slot_policies(self.sampler.num_envs)
        if self.sampler.num_envs % self.P != 0:
            # sync-mode slot%P mixing only yields equal per-policy experience
            # when slots divide evenly (MultiPolicyRunner asserts the same)
            log.warning(
                "num agent-slots (%d) is not divisible by num_policies (%d): "
                "per-policy experience will be imbalanced by up to 1 slot",
                self.sampler.num_envs, self.P,
            )
        self.slot_policies = base.reshape(self.sampler.K, self.sampler.split_size)

        example_obs = {k: jnp.asarray(v[:2]) for k, v in self.sampler._split_obs(0).items()}
        self.train_state = jax.vmap(
            lambda k: init_train_state(cfg, self.env_info, self.model, tx, k, example_obs)
        )(model_keys)

        template = _unstack(self.train_state, 0)
        for p in range(self.P):
            restored = load_checkpoint(cfg, p, template)
            if restored is not None:
                ts_p, steps_p, best_p = restored
                self.train_state = jax.tree.map(
                    lambda stacked, row: stacked.at[p].set(row), self.train_state, ts_p
                )
                self.env_steps = max(self.env_steps, steps_p)
                self.best_performance_per_policy[p] = best_p

        if self._mh:
            from sample_factory_tpu.parallel.multihost import globalize_replicated, localize_replicated

            self._localize = lambda t: localize_replicated(t, self.mesh)
            self.train_state = globalize_replicated(self.train_state, self.mesh)
        else:
            self._localize = lambda t: t

        train_fn = make_train_fn(cfg, self.env_info, self.model, tx, 0)

        def train_all_policies(stacked_ts, traj, keys, pids):
            """Every policy trains on the full batch, masked to its agents."""
            return jax.vmap(lambda ts, key, pid: train_fn(ts, traj, key, pid), in_axes=(0, 0, 0))(
                stacked_ts, keys, pids
            )

        # async mode keeps a behavior snapshot aliasing the pre-train params,
        # so the train-state buffers must not be donated there
        self._train_all = jax.jit(train_all_policies, donate_argnums=() if cfg.async_rl else (0,))
        self._policy_ids = jnp.arange(self.P, dtype=jnp.int32)

        if cfg.with_pbt:
            self.pbt = PopulationBasedTraining(
                cfg, self.P, default_reward_shaping=self.env_info.reward_shaping_scheme
            )
        log.info(
            "HostMultiPolicyRunner: %d policies, %d agent-slots (%d agents/env), mixing=%s, PBT=%s",
            self.P,
            self.sampler.num_envs,
            self.env_info.num_agents,
            self.mapping.mix_policies_in_one_env,
            bool(cfg.with_pbt),
        )

    def run(self) -> int:
        cfg = self.cfg
        self._start_time = time.time()
        self._last_report = self._last_checkpoint = self._last_best_check = self._last_milestone = self._start_time
        transitions_per_iter = self.sampler.num_envs * cfg.rollout * jax.process_count()
        frameskip = cfg.env_frameskip if cfg.summaries_use_frameskip else 1

        log.info("Starting multi-policy self-play for %d env steps", cfg.train_for_env_steps)
        status = 0
        # async snapshot: collect with the freshest already-materialized params
        # so the rollout never blocks on the in-flight population train step
        # (same fix as HostEnvRunner; policy lag is stamped via versions)
        behavior = (
            self._localize(self.train_state.params),
            self._localize(self.train_state.obs_rms),
            self.train_state.train_step,
        )
        try:
            while not self._should_end_training():
                self.key, k_collect, k_train = jax.random.split(self.key, 3)
                if self._mh:
                    # train keys stay identical across hosts (one SPMD step);
                    # only collection decorrelates
                    k_collect = jax.random.fold_in(k_collect, jax.process_index())

                if cfg.async_rl:
                    b_params, b_obs_rms, b_version = behavior
                else:
                    b_params, b_obs_rms, b_version = (
                        self._localize(self.train_state.params),
                        self._localize(self.train_state.obs_rms),
                        self.train_state.train_step,
                    )
                versions = np.asarray(jax.device_get(b_version), np.int32)
                traj, ep_stats = self.sampler.collect_rollout(
                    b_params,
                    b_obs_rms,
                    k_collect,
                    versions,
                    slot_policies=self.slot_policies,
                )
                if self._mh:
                    from sample_factory_tpu.parallel.multihost import globalize_host_trajectory

                    traj = globalize_host_trajectory(traj, self.mesh)
                    ep_stats = self._ep_agg.add(ep_stats)

                keys = jax.random.split(k_train, self.P)
                if cfg.async_rl:
                    behavior = (
                        self._localize(self.train_state.params),
                        self._localize(self.train_state.obs_rms),
                        self.train_state.train_step,
                    )
                ts, stats = self._train_all(self.train_state, traj, keys, self._policy_ids)
                self.train_state = ts

                self.env_steps += transitions_per_iter * frameskip
                self._process_selfplay_stats(stats, ep_stats)

                # async mode: periodically re-randomize the agent->policy mapping
                new_map = self.mapping.maybe_resample(self.slot_policies.reshape(-1), int(ep_stats["count"]))
                self.slot_policies = new_map.reshape(self.sampler.K, self.sampler.split_size)

                if self.pbt is not None and self.pbt.due([self.env_steps // self.P] * self.P):
                    per_policy_steps = [self.env_steps // self.P] * self.P
                    objectives = self._pbt_objectives()
                    self.train_state = self.pbt.on_training_step(self.train_state, per_policy_steps, objectives)
                    # push mutated reward shaping to the envs of affected policies
                    for policy_id, shaping in self.pbt.pending_shaping_updates:
                        mask = self.slot_policies == policy_id
                        self.sampler.set_reward_shaping(shaping, mask)
                    self.pbt.pending_shaping_updates.clear()

                self._periodic_tasks(stats)
                self._notify_observers(stats)
            # clean exit: deliver the trailing (< every) amortized episode
            # sums (same rationale as HostEnvRunner.run)
            if self._mh:
                tail = self._ep_agg.flush()
                if tail is not None:
                    n, ret, length = (
                        tail.get("count", 0.0),
                        tail.get("return_sum", 0.0),
                        tail.get("len_sum", 0.0),
                    )
                    for p in range(self.P):
                        share = float(np.mean(self.slot_policies.reshape(-1) == p))
                        self.episode_stats_per_policy[p].add_rollout_stats(n * share, ret * share, length * share)
        except KeyboardInterrupt:
            log.info("Interrupted, saving...")
            status = 1
        finally:
            self._save(is_final=True)
            if self.sampler is not None:
                self.sampler.close()
            for w in self.writers:
                if w is not None:
                    w.close()
            self.writer = None
        log.info("Self-play training finished at %d env steps", self.env_steps)
        return status

    def _pbt_objectives(self):
        """Per-policy PBT target metric: a custom stat registered in
        policy_avg_stats under cfg.pbt_target_objective (reference
        pbt_target_objective flag, e.g. dmlab_target_objective), falling back
        to the windowed episodic reward (reference 'true_objective' default)."""
        from sample_factory_tpu.parallel.multihost import broadcast_objectives

        custom = self.policy_avg_stats.get(self.cfg.pbt_target_objective)
        if custom is not None:
            objectives = [float(np.mean(custom[p])) if len(custom[p]) else None for p in range(self.P)]
        else:
            objectives = [es.avg_reward for es in self.episode_stats_per_policy]
        return broadcast_objectives(objectives)

    def _process_selfplay_stats(self, stats, ep_stats) -> None:
        now = time.time()
        self.fps_tracker.add(now, self.env_steps)
        # episode stats are per env (agents share episodes); attribute the
        # aggregate window to every policy participating in the mapping
        n, ret, length = ep_stats["count"], ep_stats["return_sum"], ep_stats["len_sum"]
        for p in range(self.P):
            share = float(np.mean(self.slot_policies.reshape(-1) == p))
            self.episode_stats_per_policy[p].add_rollout_stats(n * share, ret * share, length * share)
        extras = ep_stats.get("extra_stats") if isinstance(ep_stats, dict) else None
        if extras and self.episodic_stats_handlers:
            # self-play episodes complete per env (agents may belong to several
            # policies); attribute extras to policy 0's stream like the
            # reference does for env-level stats
            self._dispatch_extra_stats(extras, 0)
        self._last_stats = stats
