"""The learner: PPO/APPO as a single fused XLA train step.

Parity: reference `sample_factory/algo/learning/learner.py` — `_prepare_batch`
(:943, valids/max_policy_lag masking, obs normalization, T+1 value, returns
denormalization, value bootstrap on timeouts, GAE), `_train` (:671,
epoch/minibatch SGD loop), `_calculate_losses` (:537), V-trace (:602-639),
invalid-data LR scaling (:789-794), per-step policy-version publication (:821).

TPU-native design notes:
  - the whole train call (batch prep + all epochs/minibatches) is ONE jitted
    function; minibatches run under `lax.scan`, epochs unroll statically
  - the reference's PackedSequence BPTT (`rnn_utils.py`) is replaced by a
    `lax.scan` over the recurrence axis with done/invalid-masked hidden-state
    resets — identical math, static shapes (SURVEY.md §7.7)
  - data parallelism comes from jit's SPMD partitioner: trajectories are
    sharded over the env axis, params replicated, so grad reductions become
    psums over the mesh — no explicit collectives in this file
  - early-stop on loss plateau (reference :827-837) IS implemented: the
    epoch scan runs a `lax.cond` that turns post-plateau epochs into no-op
    passes (see the early-stop block in make_train_fn) — same effective
    number of SGD updates, constant trace shape
  - sync-mode generalization: one train call consumes the entire collected
    rollout (num_minibatches = dataset/batch_size per epoch) instead of
    splitting it into several sequential iterations
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from sample_factory_tpu.algo.advantages import gae_advantages, vtrace
from sample_factory_tpu.algo.distributions import get_action_distribution
from sample_factory_tpu.algo.losses import (
    clamp_ratio,
    entropy_exploration_loss,
    kl_loss as kl_loss_fn,
    masked_mean,
    normalize_advantages,
    policy_loss,
    symmetric_kl_exploration_loss,
    value_loss,
)
from sample_factory_tpu.algo.running_mean_std import (
    obs_rms_normalize,
    obs_rms_update,
    rms_denormalize,
    rms_normalize,
    rms_update,
)
from sample_factory_tpu.algo.sampling import _static_preprocess
from sample_factory_tpu.algo.schedules import lr_after_epoch, lr_after_minibatch


@struct.dataclass
class PolicyTrainState:
    """All learner state for one policy: a single pytree, shardable/checkpointable."""

    params: Any
    opt_state: Any
    obs_rms: Any  # dict[str, RunningMeanStdState] or None
    returns_rms: Any  # RunningMeanStdState or None
    curr_lr: jnp.ndarray  # f32 scalar
    train_step: jnp.ndarray  # i32 scalar: policy version (one per SGD step)
    # PBT-tunable hyperparameters as traced scalars (reference
    # pbt/population_based_training.py HYPERPARAMS_TO_TUNE): per-policy values
    # can be mutated on the host without recompiling the fused train step
    hparams: Any = None


PBT_HPARAMS = (
    "learning_rate",
    "exploration_loss_coeff",
    "value_loss_coeff",
    "max_grad_norm",
    "ppo_clip_ratio",
    "ppo_clip_value",
    "gamma",
)


def default_hparams(cfg) -> Dict[str, jnp.ndarray]:
    return {name: jnp.asarray(getattr(cfg, name), jnp.float32) for name in PBT_HPARAMS}


def build_train_pieces(cfg, env_info, model, tx: optax.GradientTransformation, policy_id: int = 0):
    """The learner decomposed into its two XLA-program-sized pieces:

    - prepare_batch(ts, traj, pid) -> (ts, dataset, valid_frac)
    - sgd_step((ts, valid_frac), (mb, key)) -> ((ts, valid_frac), aux)

    `make_train_fn` fuses them into ONE program (sync mode / device envs);
    the QuantizedTrainer (algo/quantized_train.py) dispatches them as separate
    programs interleaved with rollout inference so env workers never idle
    during training (the APPO overlap, reference inference_worker.py:349-368,
    re-expressed as device-FIFO scheduling instead of process concurrency).
    """
    action_space = env_info.action_space
    use_rnn = cfg.use_rnn
    recurrence = max(1, cfg.recurrence)

    def forward_seq(params, norm_obs, init_rnn_state, reset_flags):
        """Forward a batch of BPTT segments.

        norm_obs: dict [S, R, ...]; init_rnn_state: [S, H]; reset_flags: [S, R].
        Returns (action_params [S*R, P], values [S*R]).
        """
        S, R = reset_flags.shape
        head_out = model.apply(params, norm_obs, method="forward_head")  # [S, R, D]
        if use_rnn:
            seq = jnp.swapaxes(head_out, 0, 1)  # [R, S, D]
            resets = jnp.swapaxes(reset_flags, 0, 1)  # [R, S]
            # fused-scan BPTT: input projections for all R steps in one matmul,
            # only the recurrent half inside the scan (ops/rnn_cells.py)
            outs, _ = model.apply(params, seq, init_rnn_state, resets, method="forward_core_seq")
            core_out = jnp.swapaxes(outs, 0, 1).reshape(S * R, -1)
        else:
            flat = head_out.reshape(S * R, -1)
            core_out, _ = model.apply(params, flat, jnp.zeros((S * R, 1), jnp.float32), method="forward_core")
        action_params, values = model.apply(params, core_out, method="forward_tail")
        return action_params, values

    def compute_losses(params, mb, hp, key):
        """mb: dict of [B, ...] arrays (B = batch, segments contiguous);
        hp: dict of traced hyperparameter scalars (see PBT_HPARAMS)."""
        B = mb["valids"].shape[0]
        S = B // recurrence
        seg = lambda x: x.reshape((S, recurrence) + x.shape[1:])

        norm_obs = {k: seg(v) for k, v in mb["normalized_obs"].items()}
        init_rnn = seg(mb["rnn_states"])[:, 0]
        done_or_invalid = jnp.maximum(seg(mb["dones"]), 1.0 - seg(mb["valids"]))
        action_params, new_values = forward_seq(params, norm_obs, init_rnn, done_or_invalid)

        dist = get_action_distribution(action_space, action_params)
        log_probs = dist.log_prob(mb["actions"])
        ratio = clamp_ratio(jnp.exp(log_probs - mb["log_prob_actions"]))
        valids = mb["valids"]

        if cfg.with_vtrace:
            # per-minibatch V-trace on fresh values/ratios (reference :602-639);
            # segments are full rollouts (recurrence == rollout enforced in cfg)
            values_tm = jnp.swapaxes(seg(new_values), 0, 1)  # [R, S]
            ratios_tm = jnp.swapaxes(seg(ratio), 0, 1)
            rewards_tm = jnp.swapaxes(seg(mb["rewards"]), 0, 1)
            dones_tm = jnp.swapaxes(seg(mb["dones"]), 0, 1)
            vs, adv_tm = vtrace(
                rewards_tm, dones_tm, jax.lax.stop_gradient(values_tm), jax.lax.stop_gradient(ratios_tm),
                hp["gamma"], cfg.vtrace_rho, cfg.vtrace_c,
            )
            targets = jnp.swapaxes(vs, 0, 1).reshape(B)
            adv = jnp.swapaxes(adv_tm, 0, 1).reshape(B)
        else:
            adv = mb["advantages"]
            targets = mb["returns"]

        adv = jax.lax.stop_gradient(adv)
        targets = jax.lax.stop_gradient(targets)
        adv, adv_mean, adv_std = normalize_advantages(adv, valids)

        clip_ratio_high = 1.0 + hp["ppo_clip_ratio"]
        clip_ratio_low = 1.0 / clip_ratio_high
        p_loss = policy_loss(ratio, adv, clip_ratio_low, clip_ratio_high, valids)

        if cfg.exploration_loss == "entropy":
            expl_loss = entropy_exploration_loss(dist.entropy(), valids, hp["exploration_loss_coeff"])
        else:
            expl_loss = symmetric_kl_exploration_loss(
                dist.symmetric_kl_with_uniform_prior(), valids, hp["exploration_loss_coeff"]
            )

        old_dist = get_action_distribution(action_space, mb["action_logits"])
        kl_old = dist.kl_divergence(old_dist)
        kl_old_mean, kl_penalty = kl_loss_fn(kl_old, valids, cfg.kl_loss_coeff)

        v_loss = value_loss(new_values, mb["values"], targets, hp["ppo_clip_value"], valids, hp["value_loss_coeff"])

        loss = p_loss + expl_loss + kl_penalty + v_loss

        aux = {
            "loss": loss,
            "policy_loss": p_loss,
            "value_loss": v_loss,
            "exploration_loss": expl_loss,
            "kl_loss": kl_penalty,
            "kl_divergence": kl_old_mean,
            "kl_divergence_max": jnp.max(kl_old * valids),
            "entropy": masked_mean(dist.entropy(), valids),
            "value": masked_mean(new_values, valids),
            "adv_mean": adv_mean,
            "adv_std": adv_std,
            "ratio_mean": masked_mean(jnp.abs(1.0 - ratio), valids),
            "ratio_min": jnp.min(jnp.where(valids > 0, ratio, jnp.inf)),
            "ratio_max": jnp.max(jnp.where(valids > 0, ratio, -jnp.inf)),
            "fraction_clipped": masked_mean(
                ((ratio < clip_ratio_low) | (ratio > clip_ratio_high)).astype(jnp.float32), valids
            ),
            "max_abs_logprob": jnp.max(jnp.abs(mb["action_logits"])),
            "value_delta": masked_mean(jnp.abs(new_values - mb["values"]), valids),
        }
        return loss, aux

    grad_fn = jax.value_and_grad(compute_losses, has_aux=True)

    def sgd_step(carry, mb_and_key):
        ts, valid_frac_global = carry
        mb, key = mb_and_key
        (loss, aux), grads = grad_fn(ts.params, mb, ts.hparams, key)

        grad_norm = optax.global_norm(grads)
        if cfg.max_grad_norm > 0.0:
            # manual clip so the norm bound can be a traced per-policy value
            scale = jnp.minimum(1.0, ts.hparams["max_grad_norm"] / (grad_norm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)

        # invalid-data LR scaling (reference :789-794)
        actual_lr = ts.curr_lr * valid_frac_global
        opt_state = _set_lr(ts.opt_state, actual_lr)
        updates, new_opt_state = tx.update(grads, opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)

        new_lr = lr_after_minibatch(cfg, ts.curr_lr, aux["kl_divergence"], ts.train_step)
        ts = ts.replace(
            params=new_params,
            opt_state=new_opt_state,
            curr_lr=new_lr,
            train_step=ts.train_step + 1,
        )
        aux = dict(aux)
        aux["grad_norm"] = grad_norm
        aux["actual_lr"] = actual_lr
        return (ts, valid_frac_global), aux

    def prepare_batch(ts: PolicyTrainState, traj: Dict[str, Any], pid):
        """Reference _prepare_batch (:943-1030), on time-major arrays."""
        T = traj["rewards"].shape[0]
        N = traj["rewards"].shape[1]

        # --- valids: same policy & within lag budget (reference :949-955)
        same_policy = traj["policy_id"] == pid
        within_lag = (ts.train_step - traj["policy_version"]) < cfg.max_policy_lag
        valids_t = (same_policy & within_lag).astype(jnp.float32)  # [T, N]
        valids = jnp.concatenate([valids_t, valids_t[-1:]], axis=0)  # [T+1, N]

        # --- obs normalization: update running stats, then normalize (training mode)
        pre_obs = {k: _static_preprocess(cfg, {k: v})[k] for k, v in traj["obs"].items()}
        obs_rms = ts.obs_rms
        if obs_rms is not None:
            flat_obs = {k: v.reshape((-1,) + v.shape[2:]) for k, v in pre_obs.items()}
            # masked by valids: in mixed-policy self-play the shared trajectory
            # carries other policies' slots; stats must only see our experience
            obs_rms = obs_rms_update(obs_rms, {k: flat_obs[k] for k in obs_rms}, mask=valids.reshape(-1))
            normalized_obs = obs_rms_normalize(obs_rms, pre_obs)
        else:
            normalized_obs = pre_obs

        # --- T+1 bootstrap values with the CURRENT policy (reference :964-967)
        last_obs = {k: v[-1] for k, v in normalized_obs.items()}
        _, next_values, _ = model.apply(ts.params, last_obs, traj["rnn_states"][-1])
        values = jnp.concatenate([traj["values"], next_values[None]], axis=0)  # [T+1, N]

        # --- denormalize values for GAE (reference :969-978)
        if cfg.normalize_returns and ts.returns_rms is not None:
            denorm_values = rms_denormalize(ts.returns_rms, values[..., None])[..., 0]
        else:
            denorm_values = values

        rewards = traj["rewards"]
        gamma = ts.hparams["gamma"]
        if cfg.value_bootstrap:
            # count only timeouts in terminal states (reference :980-990)
            rewards = rewards + gamma * denorm_values[:-1] * traj["time_outs"] * traj["dones"]

        returns_rms = ts.returns_rms
        if not cfg.with_vtrace:
            advantages = gae_advantages(rewards, traj["dones"], denorm_values, valids, gamma, cfg.gae_lambda)
            returns = advantages + valids[:-1] * denorm_values[:-1]
            if cfg.normalize_returns and returns_rms is not None:
                # masked by valids: invalid slots carry structurally-zero
                # returns that would dilute the running stats toward zero
                returns_rms = rms_update(returns_rms, returns.reshape(-1, 1), mask=valids_t.reshape(-1))
                returns = rms_normalize(returns_rms, returns[..., None])[..., 0]
        else:
            advantages = jnp.zeros_like(rewards)
            returns = jnp.zeros_like(rewards)

        # --- flatten to env-major dataset: [T, N] -> [N*T] with each env's
        # rollout contiguous (BPTT segments must be contiguous slices)
        def to_dataset(x):
            x = jnp.swapaxes(x, 0, 1)  # [N, T, ...]
            return x.reshape((N * T,) + x.shape[2:])

        dataset = {
            "normalized_obs": {k: to_dataset(v[:T]) for k, v in normalized_obs.items()},
            "rnn_states": to_dataset(traj["rnn_states"][:T]),
            "actions": to_dataset(traj["actions"]),
            "action_logits": to_dataset(traj["action_logits"]),
            "log_prob_actions": to_dataset(traj["log_prob_actions"]),
            "values": to_dataset(traj["values"]),
            "rewards": to_dataset(rewards),
            "dones": to_dataset(traj["dones"]),
            "advantages": to_dataset(advantages),
            "returns": to_dataset(returns),
            "valids": to_dataset(valids[:T]),
        }

        # neutralize invalid slots so logprob math can't NaN (reference :1020-1028)
        invalid = dataset["valids"] == 0
        dataset["actions"] = jnp.where(invalid[:, None], jnp.zeros_like(dataset["actions"]), dataset["actions"])
        dataset["log_prob_actions"] = jnp.where(invalid, -1.0, dataset["log_prob_actions"])

        valid_frac = jnp.mean(dataset["valids"])
        return ts.replace(obs_rms=obs_rms, returns_rms=returns_rms), dataset, valid_frac

    return sgd_step, prepare_batch


def make_train_fn(cfg, env_info, model, tx: optax.GradientTransformation, policy_id: int = 0) -> Callable:
    """Build train(ts, traj, key) -> (ts, stats) as ONE fused XLA program.
    traj is time-major [T(+1), N, ...]."""
    recurrence = max(1, cfg.recurrence)
    sgd_step, prepare_batch = build_train_pieces(cfg, env_info, model, tx, policy_id)

    def train(
        ts: PolicyTrainState, traj: Dict[str, Any], key, pid=policy_id
    ) -> Tuple[PolicyTrainState, Dict[str, jnp.ndarray]]:
        """pid may be a traced per-policy index (vmapped population training)."""
        ts, dataset, valid_frac = prepare_batch(ts, traj, pid)

        dataset_size = dataset["valids"].shape[0]
        batch_size = min(cfg.batch_size, dataset_size)
        num_minibatches = dataset_size // batch_size
        num_segments = dataset_size // recurrence
        segs_per_mb = batch_size // recurrence

        def make_epoch_minibatches(key):
            if not cfg.shuffle_minibatches:
                # contiguous minibatches: a pure reshape, no data movement
                # (reference default; shuffling is opt-in there too, cfg.py
                # --shuffle_minibatches "slow operation when batches are large")
                def split(x):
                    used = num_minibatches * batch_size
                    return x[:used].reshape((num_minibatches, batch_size) + x.shape[1:])

                return jax.tree.map(split, dataset)

            perm = jax.random.permutation(key, num_segments)[: num_minibatches * segs_per_mb]

            def gather(x):
                seg_view = x.reshape((num_segments, recurrence) + x.shape[1:])
                sel = jnp.take(seg_view, perm, axis=0)  # [used_segs, R, ...]
                return sel.reshape((num_minibatches, batch_size) + x.shape[1:])

            return jax.tree.map(gather, dataset)

        def run_epoch(ts, key):
            key, k_epoch, k_mb = jax.random.split(key, 3)
            minibatches = make_epoch_minibatches(k_epoch)
            mb_keys = jax.random.split(k_mb, num_minibatches)
            (ts, _), aux_seq = jax.lax.scan(sgd_step, (ts, valid_frac), (minibatches, mb_keys))
            ts = ts.replace(curr_lr=lr_after_epoch(cfg, ts.curr_lr, jnp.mean(aux_seq["kl_divergence"])))
            return ts, aux_seq

        # epoch 0 always runs; subsequent epochs early-stop when the mean
        # policy loss plateaus (reference learner.py:676,827-837: tolerance
        # 1e-6 on the epoch-mean actor loss). Under jit the loop is unrolled
        # statically, so the skip is a lax.cond (no compute at runtime, not
        # a shorter program).
        early_stopping_tolerance = 1e-6
        ts, aux_seq = run_epoch(ts, key)
        prev_epoch_loss = jnp.mean(aux_seq["policy_loss"])
        stop = jnp.zeros((), bool)
        epochs_executed = jnp.ones((), jnp.int32)
        for _ in range(1, cfg.num_epochs):
            key, k = jax.random.split(key)
            ran = 1 - stop.astype(jnp.int32)
            ts, aux_seq = jax.lax.cond(
                stop,
                lambda operand: operand[:2],  # skip: keep state + previous epoch's aux
                lambda operand: run_epoch(operand[0], operand[2]),
                (ts, aux_seq, k),
            )
            epoch_loss = jnp.mean(aux_seq["policy_loss"])
            stop = jnp.logical_or(stop, jnp.abs(prev_epoch_loss - epoch_loss) < early_stopping_tolerance)
            prev_epoch_loss = epoch_loss
            epochs_executed = epochs_executed + ran

        # summaries from a RANDOM minibatch of the last executed epoch — the
        # last slot would bias plateau/KL readings consumed by PBT and
        # adaptive LR (reference learner.py:693-703 samples a random
        # epoch/minibatch for summaries)
        key, k_stats = jax.random.split(key)
        mb_idx = jax.random.randint(k_stats, (), 0, aux_seq["loss"].shape[0])
        stats = {k: v[mb_idx] for k, v in aux_seq.items()}
        stats["epochs_executed"] = epochs_executed
        stats["valids_fraction"] = valid_frac
        stats["lr"] = ts.curr_lr
        stats["version_diff_max"] = jnp.max(ts.train_step - traj["policy_version"])
        return ts, stats

    return train


def _set_lr(opt_state, lr):
    """Functionally set the injected learning rate (optax InjectHyperparamsState)."""
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = lr
    return opt_state._replace(hyperparams=hyperparams)


def init_train_state(cfg, env_info, model, tx, init_key, example_obs) -> PolicyTrainState:
    """Initialize params/opt/normalizers for one policy."""
    from sample_factory_tpu.algo.running_mean_std import obs_rms_init, rms_init
    from sample_factory_tpu.models.actor_critic import initial_actor_critic_state

    batch = jax.tree.leaves(example_obs)[0].shape[0]
    rnn_state = initial_actor_critic_state(cfg, batch)
    params = model.init(init_key, example_obs, rnn_state)
    opt_state = tx.init(params)
    obs_rms = (
        obs_rms_init(env_info.obs_space, keys_to_normalize=cfg.normalize_input_keys) if cfg.normalize_input else None
    )
    returns_rms = rms_init((1,)) if cfg.normalize_returns else None
    return PolicyTrainState(
        params=params,
        opt_state=opt_state,
        obs_rms=obs_rms,
        returns_rms=returns_rms,
        curr_lr=jnp.asarray(cfg.learning_rate, jnp.float32),
        train_step=jnp.zeros((), jnp.int32),
        hparams=default_hparams(cfg),
    )
