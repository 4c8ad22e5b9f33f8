"""Population-based training over a vmapped policy population.

Parity: reference `sample_factory/pbt/population_based_training.py` —
HYPERPARAMS_TO_TUNE (:58), _perturb_param (:209), policy ranking + bottom-
fraction replacement with reward-gap gating (:296-365), policy 0 never mutated
(:353-360), per-policy cfg JSON files (:196-206). TPU-native differences: the
population lives as a stacked-parameter pytree on device, so "replace policy
i's weights with policy j's" is a host-side `x.at[i].set(x[j])` over the
stacked train state instead of the reference's save->load signal handshake,
and mutated hyperparameters are traced scalars written into the state
(no learner-process cfg updates, no recompilation).
"""

from __future__ import annotations

import copy
import json
import math
import random
from os.path import join
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sample_factory_tpu.algo.learning import PBT_HPARAMS
from sample_factory_tpu.utils.utils import experiment_dir, log

EPS = 1e-5


def perturb_float(x: float, perturb_amount: float = 1.2, rng: random.Random = random) -> float:
    # mutation direction is random (reference perturb_float). The rng is the
    # PBT instance's seeded Random: with identical seeds + identical
    # (broadcast) objectives, every host draws the same mutations — required
    # for multihost PBT agreement (tests/test_multihost.py).
    if rng.random() < 0.5:
        return x / perturb_amount
    return x * perturb_amount


def perturb_exponential_decay(
    x: float, perturb_amount_min=1.01, perturb_amount_max=1.2, rng: random.Random = random
) -> float:
    """For params like gamma: perturb (1 - x) so values near 1 move slowly."""
    amount = rng.uniform(perturb_amount_min, perturb_amount_max)
    return max(EPS, 1.0 - perturb_float(1.0 - x, amount, rng))


SPECIAL_PERTURBATION = {"gamma": perturb_exponential_decay}


def policy_cfg_file(cfg, policy_id: int) -> str:
    return join(experiment_dir(cfg), f"policy_{policy_id:02d}_cfg.json")


class PopulationBasedTraining:
    """Host-side PBT observer for the stacked-population runner.

    Call `on_training_step(...)` periodically; it returns a possibly-updated
    stacked train state.
    """

    def __init__(self, cfg, num_policies: Optional[int] = None, default_reward_shaping: Optional[Dict] = None):
        self.cfg = cfg
        self.P = num_policies or cfg.num_policies
        # sorted: mutation order maps RNG draws to params deterministically
        # (set iteration order varies with hash randomization — cross-host
        # PBT agreement needs every host to draw in the same order)
        self.hparams_to_tune = tuple(
            sorted(n for n in PBT_HPARAMS if n != "gamma" or cfg.pbt_optimize_gamma)
        )
        self.default_hparams = {name: float(getattr(cfg, name)) for name in PBT_HPARAMS}
        self.policy_hparams: List[Dict[str, float]] = [dict(self.default_hparams) for _ in range(self.P)]
        # reward shaping population (reference policy_reward_shaping, :128-151)
        self.default_reward_shaping = copy.deepcopy(default_reward_shaping)
        self.policy_reward_shaping: List[Optional[Dict]] = [
            copy.deepcopy(default_reward_shaping) for _ in range(self.P)
        ]
        # (policy_id, shaping) updates the runner must push to the sampler
        self.pending_shaping_updates: List[tuple] = []
        self.last_update = [0] * self.P
        self.rng = random.Random(cfg.seed)

    # --------------------------------------------------------------- mutation

    def _perturb_param(self, value: float, name: str) -> float:
        if self.rng.random() > self.cfg.pbt_mutation_rate:
            return value
        if value != self.default_hparams[name] and self.rng.random() < 0.01:
            return self.default_hparams[name]
        if name in SPECIAL_PERTURBATION:
            new_value = SPECIAL_PERTURBATION[name](value, rng=self.rng)
        else:
            amount = self.rng.uniform(self.cfg.pbt_perturb_min, self.cfg.pbt_perturb_max)
            new_value = perturb_float(float(value), amount, self.rng)
        log.debug("PBT: %s %.6f -> %.6f", name, value, new_value)
        return new_value

    def _perturb_hparams(self, hparams: Dict[str, float]) -> Dict[str, float]:
        out = dict(hparams)
        for name in self.hparams_to_tune:
            out[name] = self._perturb_param(out[name], name)
        return out

    def _perturb_reward_shaping(self, shaping: Optional[Dict]) -> Optional[Dict]:
        """Mutate numeric leaves of the (possibly nested) shaping dict
        (reference _perturb, :232-254)."""
        if shaping is None:
            return None

        def perturb_leaf(value, default, name):
            if isinstance(value, dict):
                return {k: perturb_leaf(v, (default or {}).get(k), f"{name}_{k}") for k, v in value.items()}
            if isinstance(value, (tuple, list)):
                return type(value)(
                    self._perturb_shaping_value(v, (default or [v])[i] if default else v, f"{name}_{i}")
                    for i, v in enumerate(value)
                )
            return self._perturb_shaping_value(value, default if default is not None else value, name)

        return {k: perturb_leaf(v, (self.default_reward_shaping or {}).get(k), k) for k, v in shaping.items()}

    def _perturb_shaping_value(self, value, default, name):
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            return value
        if self.rng.random() > self.cfg.pbt_mutation_rate:
            return value
        if value != default and self.rng.random() < 0.01:
            return default
        amount = self.rng.uniform(self.cfg.pbt_perturb_min, self.cfg.pbt_perturb_max)
        return perturb_float(float(value), amount, self.rng)

    # ------------------------------------------------------------ application

    def _write_hparams_into_state(self, stacked_ts, policy_id: int):
        hp = self.policy_hparams[policy_id]
        new_hparams = {
            name: stacked_ts.hparams[name].at[policy_id].set(hp[name]) for name in stacked_ts.hparams
        }
        # constant-LR runs take the mutated learning rate immediately
        # (reference learner.py:400-406)
        curr_lr = stacked_ts.curr_lr
        if self.cfg.lr_schedule == "constant":
            curr_lr = curr_lr.at[policy_id].set(hp["learning_rate"])
        return stacked_ts.replace(hparams=new_hparams, curr_lr=curr_lr)

    def _replace_weights(self, stacked_ts, dst: int, src: int):
        """Copy policy src's weights/optimizer/normalizers into slot dst."""
        if dst == src:
            return stacked_ts

        def copy_row(x):
            return x.at[dst].set(x[src])

        new_params = jax.tree.map(copy_row, stacked_ts.params)
        new_opt = jax.tree.map(copy_row, stacked_ts.opt_state)
        new_obs_rms = jax.tree.map(copy_row, stacked_ts.obs_rms) if stacked_ts.obs_rms is not None else None
        new_ret_rms = jax.tree.map(copy_row, stacked_ts.returns_rms) if stacked_ts.returns_rms is not None else None
        # invalidate in-flight experience of the replaced policy
        # (reference learner.py _maybe_load_policy: += max_policy_lag + 1)
        new_train_step = stacked_ts.train_step.at[dst].set(
            stacked_ts.train_step[dst] + self.cfg.max_policy_lag + 1
        )
        return stacked_ts.replace(
            params=new_params,
            opt_state=new_opt,
            obs_rms=new_obs_rms,
            returns_rms=new_ret_rms,
            train_step=new_train_step,
        )

    def _save_policy_cfg(self, policy_id: int) -> None:
        from sample_factory_tpu.parallel.multihost import is_primary_host

        if not is_primary_host():
            return  # shared fs: every host makes the same decision, host 0 records it
        with open(policy_cfg_file(self.cfg, policy_id), "w") as f:
            json.dump(self.policy_hparams[policy_id], f, indent=2)
        if self.policy_reward_shaping[policy_id] is not None:
            path = join(experiment_dir(self.cfg), f"policy_{policy_id:02d}_reward_shaping.json")
            with open(path, "w") as f:
                json.dump(self.policy_reward_shaping[policy_id], f, indent=2)

    # ----------------------------------------------------------------- driver

    def due(self, env_steps_per_policy: List[int]) -> bool:
        """True when at least one policy is eligible for a PBT update — lets
        runners skip computing objectives (which may force a device sync) on
        the vast majority of iterations."""
        if not self.cfg.with_pbt or self.P <= 1:
            return False
        return any(
            steps >= self.cfg.pbt_start_mutation
            and steps - self.last_update[p] >= self.cfg.pbt_period_env_steps
            for p, steps in enumerate(env_steps_per_policy)
        )

    def on_training_step(self, stacked_ts, env_steps_per_policy: List[int], objectives: List[Optional[float]]):
        """objectives: windowed per-policy target metric (true_objective or
        episode reward). Returns the (possibly updated) stacked train state."""
        if not self.cfg.with_pbt or self.P <= 1:
            return stacked_ts

        for policy_id in range(self.P):
            steps = env_steps_per_policy[policy_id]
            if steps < self.cfg.pbt_start_mutation:
                continue
            if steps - self.last_update[policy_id] < self.cfg.pbt_period_env_steps:
                continue
            stacked_ts = self._update_policy(stacked_ts, policy_id, objectives)
            self.last_update[policy_id] = steps
        return stacked_ts

    def _update_policy(self, stacked_ts, policy_id: int, objectives: List[Optional[float]]):
        if any(o is None for o in objectives):
            return stacked_ts  # not enough data yet (reference :300-306)

        order = sorted(range(self.P), key=lambda p: objectives[p], reverse=True)
        replace_number = math.ceil(self.cfg.pbt_replace_fraction * self.P)
        best = order[:replace_number]
        worst = order[-replace_number:]

        if policy_id in best:
            return stacked_ts

        replacement = policy_id
        if policy_id in worst:
            candidate = self.rng.choice(best)
            delta = objectives[candidate] - objectives[policy_id]
            delta_relative = abs(delta / (objectives[candidate] + EPS))
            if abs(delta) > self.cfg.pbt_replace_reward_gap_absolute and delta_relative > self.cfg.pbt_replace_reward_gap:
                replacement = candidate
                log.debug("PBT: policy %d weights replaced by %d (gap %.4f)", policy_id, candidate, delta)

        if policy_id == 0:
            # never mutate policy 0 (the reference baseline policy, :353-360);
            # it may still inherit a better policy's parameters wholesale
            self.policy_hparams[policy_id] = dict(self.policy_hparams[replacement])
            self.policy_reward_shaping[policy_id] = copy.deepcopy(self.policy_reward_shaping[replacement])
        else:
            self.policy_hparams[policy_id] = self._perturb_hparams(self.policy_hparams[replacement])
            self.policy_reward_shaping[policy_id] = self._perturb_reward_shaping(
                self.policy_reward_shaping[replacement]
            )

        stacked_ts = self._replace_weights(stacked_ts, policy_id, replacement)
        stacked_ts = self._write_hparams_into_state(stacked_ts, policy_id)
        if self.policy_reward_shaping[policy_id] is not None:
            self.pending_shaping_updates.append((policy_id, self.policy_reward_shaping[policy_id]))
        self._save_policy_cfg(policy_id)
        return stacked_ts
