"""Multi-policy (population) runner: P policies trained jointly on one mesh.

Parity: the reference runs one learner process per policy, each pinned to its
own GPU (reference `algo/learning/learner_worker.py:44-45`,
`utils/gpu_utils.py:62-90`) with agent->policy mapping
(`algo/utils/agent_policy_mapping.py:39-45`: deterministic env_idx % P in sync
mode). TPU-native design (SURVEY.md §2.3 "population parallelism"): policy
params are STACKED on a leading axis and the whole population trains as one
`vmap`ed program — envs are partitioned into P contiguous blocks (the
deterministic mapping), each block sampled and learned by its policy slot.
PBT exploit/explore happens on the host between iterations by editing rows of
the stacked state (see pbt/pbt.py).

Multi-agent device envs (env.num_agents > 1) train with WITHIN-ENV POLICY
MIXING (self-play): agents are flattened into policy slots, one shared rollout
runs a P-way forward + per-slot select (algo/sampling.py
make_mixed_rollout_fn), and every policy trains on the shared trajectory
masked to its own slots via the learner's policy_id valids (reference
non_batched_sampling.py:25-313 per-agent ActorState policies +
agent_policy_mapping.py:47-59 mixing).
"""

from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sample_factory_tpu.algo.learning import init_train_state, make_train_fn
from sample_factory_tpu.algo.optimizers import make_optimizer
from sample_factory_tpu.algo.sampling import init_sampler_state, make_rollout_fn
from sample_factory_tpu.envs.device_env import DeviceEnv
from sample_factory_tpu.envs.env_info import extract_env_info
from sample_factory_tpu.envs.env_utils import create_env
from sample_factory_tpu.models.actor_critic import create_actor_critic
from sample_factory_tpu.pbt.pbt import PopulationBasedTraining
from sample_factory_tpu.runner.checkpoint import load_checkpoint, save_checkpoint
from sample_factory_tpu.runner.runner import Runner
from sample_factory_tpu.runner.stats import EpisodeStats, FpsTracker, SummaryWriter
from sample_factory_tpu.utils.utils import done_filename, experiment_dir, init_file_logger, log, save_cfg


def _unstack(tree, p: int):
    return jax.tree.map(lambda x: x[p], tree)


class MultiPolicyRunner(Runner):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.P = cfg.num_policies
        self.episode_stats_per_policy: List[EpisodeStats] = [EpisodeStats(cfg.stats_avg) for _ in range(self.P)]
        self.writers: List[Optional[SummaryWriter]] = [None] * self.P
        self.pbt: Optional[PopulationBasedTraining] = None
        self.best_performance_per_policy = [-1e9] * self.P

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

        from sample_factory_tpu.utils.wandb_utils import init_wandb

        init_wandb(cfg)

        env = create_env(cfg.env, cfg=cfg, env_config=None)
        assert isinstance(env, DeviceEnv)
        self.env = env
        self.env_info = extract_env_info(env, cfg)

        # multi-agent device envs train with within-env policy mixing: agents
        # of ONE env are driven by different policies of the population
        # (self-play; reference agent_policy_mapping.py:47-59 + per-agent
        # ActorState policies, non_batched_sampling.py:25-313)
        self.A = self.env_info.num_agents
        self.mixed = self.A > 1

        if self.mixed:
            self.num_slots = cfg.num_envs * self.A
            assert self.num_slots % self.P == 0, (
                f"num_envs*num_agents ({self.num_slots}) must divide by num_policies ({self.P})"
            )
        else:
            assert cfg.num_envs % self.P == 0, f"num_envs ({cfg.num_envs}) must divide by num_policies ({self.P})"
            self.envs_per_policy = cfg.num_envs // self.P

        self.model = create_actor_critic(cfg, self.env_info.obs_space, self.env_info.action_space)
        tx = make_optimizer(cfg)

        self.key = jax.random.PRNGKey(cfg.seed)
        env_keys = jax.random.split(jax.random.fold_in(self.key, 1), self.P)
        model_keys = jax.random.split(jax.random.fold_in(self.key, 2), self.P)

        if self.mixed:
            from sample_factory_tpu.algo.sampling import init_mixed_sampler_state

            self.sampler_state = init_mixed_sampler_state(cfg, env, env_keys[0], cfg.num_envs, self.P)
            example_obs = {k: v[:2] for k, v in self.sampler_state.obs.items()}
            B = cfg.num_envs
        else:
            B = self.envs_per_policy
            self.sampler_state = jax.vmap(lambda k: init_sampler_state(cfg, env, k, B))(env_keys)
            example_obs = {k: v[0, :2] for k, v in self.sampler_state.obs.items()}
        self.train_state = jax.vmap(
            lambda k: init_train_state(cfg, self.env_info, self.model, tx, k, example_obs)
        )(model_keys)

        # per-policy checkpoint restore
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

        train_fn = make_train_fn(cfg, self.env_info, self.model, tx, 0)
        pids = jnp.arange(self.P, dtype=jnp.int32)

        if self.mixed:
            from sample_factory_tpu.algo.agent_policy_mapping import AgentPolicyMapping
            from sample_factory_tpu.algo.sampling import make_mixed_rollout_fn

            mapping = AgentPolicyMapping(cfg, self.env_info)
            slot_policies = mapping.initial_slot_policies(self.num_slots)
            self._policy_ids = jnp.asarray(slot_policies, jnp.int32)  # per-slot assignment
            mixed_rollout = make_mixed_rollout_fn(cfg, env, self.env_info, self.model, self.P)

            def mixed_iteration(ts, ss, keys, slot_pol):
                # ONE shared rollout with per-slot policy selection, then every
                # policy trains on the shared trajectory masked to its own
                # slots (valids: policy_id match — the same mechanism that
                # handles invalid/inactive data, algo/learning.py)
                ss, traj, ep_stats = mixed_rollout(ts.params, ts.obs_rms, ss, slot_pol, ts.train_step)
                ts, stats = jax.vmap(lambda t, k, pid: train_fn(t, traj, k, pid))(ts, keys, pids)
                return ts, ss, stats, ep_stats

            self._train_iteration = jax.jit(mixed_iteration, donate_argnums=(0, 1))
        else:
            rollout_fn = make_rollout_fn(cfg, env, self.env_info, self.model)

            def one_policy_iteration(ts, ss, key, pid):
                ss, traj, ep_stats = rollout_fn(ts.params, ts.obs_rms, ss, ts.train_step, pid)
                ts, stats = train_fn(ts, traj, key, pid)
                return ts, ss, stats, ep_stats

            self._train_iteration = jax.jit(jax.vmap(one_policy_iteration), donate_argnums=(0, 1))
            self._policy_ids = pids

        if cfg.with_pbt:
            self.pbt = PopulationBasedTraining(
                cfg, self.P, default_reward_shaping=self.env_info.reward_shaping_scheme
            )
        if self.mixed:
            log.info(
                "MultiPolicyRunner: %d policies MIXED over %d envs x %d agents (self-play), PBT=%s",
                self.P, cfg.num_envs, self.A, bool(cfg.with_pbt),
            )
        else:
            log.info(
                "MultiPolicyRunner: %d policies x %d envs, PBT=%s", self.P, B, bool(cfg.with_pbt)
            )

    def run(self) -> int:
        cfg = self.cfg
        self._start_time = time.time()
        self._last_report = self._last_checkpoint = self._last_best_check = self._last_milestone = self._start_time
        transitions_per_iter = cfg.num_envs * self.env_info.num_agents * cfg.rollout
        frameskip = cfg.env_frameskip if cfg.summaries_use_frameskip else 1

        log.info("Starting population training for %d env steps", cfg.train_for_env_steps)
        status = 0
        try:
            while not self._should_end_training():
                self.key, k = jax.random.split(self.key)
                keys = jax.random.split(k, self.P)
                ts, ss, stats, ep_stats = self._train_iteration(
                    self.train_state, self.sampler_state, keys, self._policy_ids
                )
                self.train_state, self.sampler_state = ts, ss
                self.env_steps += transitions_per_iter * frameskip
                self._process_population_stats(stats, ep_stats)

                if self.pbt is not None:
                    per_policy_steps = [self.env_steps // self.P] * self.P
                    if self.pbt.due(per_policy_steps):
                        objectives = self._pbt_objectives()
                        self.train_state = self.pbt.on_training_step(self.train_state, per_policy_steps, objectives)
                        self._apply_shaping_updates()

                self._periodic_tasks(stats)
                self._notify_observers(stats)
        except KeyboardInterrupt:
            log.info("Interrupted, saving...")
            status = 1
        finally:
            self._drain_ep_stats()
            self._save(is_final=True)
            for w in self.writers:
                if w is not None:
                    w.close()
            self.writer = None
        log.info("Population training finished at %d env steps", self.env_steps)
        return status

    # ------------------------------------------------------------- internals

    def _apply_shaping_updates(self) -> None:
        """Write PBT-mutated reward-shaping coefficients into the affected
        policy's row of the stacked sampler state (runtime scalars read by
        env.step_shaped — no recompilation)."""
        if not self.pbt.pending_shaping_updates:
            return
        if self.sampler_state.shaping is None:
            log.warning(
                "PBT mutated reward shaping but env %s has no dynamic shaping support; ignored",
                self.cfg.env,
            )
            self.pbt.pending_shaping_updates.clear()
            return
        shaping = self.sampler_state.shaping
        for policy_id, new_values in self.pbt.pending_shaping_updates:
            shaping = {
                k: (v.at[policy_id].set(float(new_values[k])) if k in new_values else v)
                for k, v in shaping.items()
            }
        self.sampler_state = self.sampler_state.replace(shaping=shaping)
        self.pbt.pending_shaping_updates.clear()

    def _pbt_objectives(self):
        """Custom PBT target stat from policy_avg_stats (cfg.pbt_target_objective,
        reference pbt/population_based_training.py), else windowed reward.
        Multihost: host 0's objectives are broadcast so every host makes the
        same exploit/explore decisions (PBT RNG is seeded identically)."""
        import numpy as np

        from sample_factory_tpu.parallel.multihost import broadcast_objectives

        self._drain_ep_stats()
        custom = self.policy_avg_stats.get(self.cfg.pbt_target_objective)
        if custom is not None:
            objectives = [float(np.mean(custom[p])) if len(custom[p]) else None for p in range(self.P)]
        else:
            objectives = [es.avg_reward for es in self.episode_stats_per_policy]
        return broadcast_objectives(objectives)

    def _process_population_stats(self, stats, ep_stats) -> None:
        now = time.time()
        self.fps_tracker.add(now, self.env_steps)
        # per-policy ep sums come out of the global SPMD program — already
        # cross-host totals on every host (see Runner._process_stats). Kept as
        # device futures; drained at report/PBT time (per-iteration
        # device_get would serialize host and device)
        self._pending_ep.append(ep_stats)
        if len(self._pending_ep) >= self._max_pending_ep:
            self._drain_ep_stats()
        self._last_stats = stats

    def _drain_ep_stats(self) -> None:
        if not self._pending_ep:
            return
        pending, self._pending_ep = self._pending_ep, []
        for ep in jax.device_get(pending):
            for p in range(self.P):
                self.episode_stats_per_policy[p].add_rollout_stats(
                    float(ep["count"][p]), float(ep["return_sum"][p]), float(ep["len_sum"][p])
                )

    def _report(self, stats) -> None:
        self._drain_ep_stats()
        host_stats = jax.device_get(stats)
        fps10 = self.fps_tracker.fps(10)
        rewards = [es.avg_reward for es in self.episode_stats_per_policy]
        log.info(
            "Fps: %.1f. Frames: %d. Per-policy avg rewards: %s",
            fps10,
            self.env_steps,
            ["%.3f" % r if r is not None else "n/a" for r in rewards],
        )
        for p in range(self.P):
            scalars = {k: float(np.asarray(v)[p]) for k, v in host_stats.items()}
            scalars["fps"] = fps10
            if rewards[p] is not None:
                scalars["reward"] = rewards[p]
            if self.pbt is not None:
                for name, value in self.pbt.policy_hparams[p].items():
                    scalars[f"pbt_{name}"] = value
            self.writers[p].write(self.env_steps, scalars)
            for obs in self.observers:
                obs.extra_summaries(self, p, self.writers[p], self.env_steps)
            self.writers[p].flush()

    def _save(self, is_final: bool = False, milestone: bool = False) -> None:
        from sample_factory_tpu.parallel.multihost import is_primary_host

        if not is_primary_host():
            return  # shared fs: only host 0 writes checkpoints
        for p in range(self.P):
            save_checkpoint(
                self.cfg,
                p,
                _unstack(self.train_state, p),
                self.env_steps,
                self.best_performance_per_policy[p],
                milestone=milestone,
            )
        if is_final:
            with open(done_filename(self.cfg), "w") as f:
                f.write(str(self.env_steps))

    def _maybe_save_best(self) -> None:
        self._drain_ep_stats()
        if self.env_steps < self.cfg.save_best_after:
            return
        for p in range(self.P):
            metric = self.episode_stats_per_policy[p].avg_reward
            if metric is not None and metric - self.best_performance_per_policy[p] > 1e-9:
                self.best_performance_per_policy[p] = metric
                save_checkpoint(
                    self.cfg, p, _unstack(self.train_state, p), self.env_steps, metric, is_best=True
                )
