"""QuantizedTrainer: the learner as a stream of minibatch-sized XLA programs.

TPU-native APPO overlap. A single chip executes dispatched programs in FIFO
order, so a fused train step would stall the next rollout's first inference
(and with it every CPU env worker) for the whole step duration. Instead the
train step is decomposed into

    prepare -> (num_epochs x num_minibatches) sgd quanta -> per-epoch lr

and the host dispatches one quantum right after each env-step's actions are
shipped to the CPU workers (the `idle_fn` hook in
HostVectorSampler.collect_rollout). Each quantum executes while the workers
step — time when the device would otherwise sit idle — so training hides
behind environment time. This is the same overlap the reference gets from
separate learner/inference processes (reference
`algo/sampling/inference_worker.py:349-368` opportunistic weight refresh,
`algo/learning/batcher.py:170-218` double-buffered batches), achieved by
device-FIFO *scheduling* instead of process concurrency.

Semantics match the fused train step (`make_train_fn`):
  - shuffle_minibatches: a per-epoch permutation-gather quantum rebuilds the
    minibatch tensor on device (same segment-level permutation as the fused
    path); without shuffle the minibatch tensor is built once in prepare and
    each sgd quantum is a pure dynamic-slice;
  - epoch early-stop (reference learner.py:676,827-837: tolerance 1e-6 on the
    epoch-mean policy loss, first two epochs always run): before epoch e >= 2
    the host reads the two previous epoch-loss scalars — dispatched one
    quantum earlier, so normally already materialized — and drops the
    remaining quanta of this train step when the loss has plateaued.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sample_factory_tpu.algo.learning import PolicyTrainState, build_train_pieces
from sample_factory_tpu.algo.schedules import lr_after_epoch


class QuantizedTrainer:
    early_stopping_tolerance = 1e-6  # reference learner.py:676

    def __init__(self, cfg, env_info, model, tx, policy_id: int = 0, num_envs: Optional[int] = None):
        self.cfg = cfg
        sgd_step, prepare_batch = build_train_pieces(cfg, env_info, model, tx, policy_id)

        n = num_envs if num_envs is not None else cfg.num_envs
        dataset_size = n * cfg.rollout
        self.batch_size = min(cfg.batch_size, dataset_size)
        self.num_minibatches = dataset_size // self.batch_size
        self.num_epochs = cfg.num_epochs
        self.shuffle = bool(cfg.shuffle_minibatches)
        recurrence = max(1, cfg.recurrence)
        num_segments = dataset_size // recurrence
        segs_per_mb = self.batch_size // recurrence
        # train_step advances one per sgd quantum — lets the runner mirror the
        # policy version on the host without a device sync (early-stop skips
        # are corrected at flush via last_skipped_sgd_steps)
        self.sgd_steps_per_train = self.num_minibatches * self.num_epochs
        self.last_sgd_steps_executed = self.sgd_steps_per_train
        self.last_skipped_sgd_steps = 0
        pid = policy_id
        M, B = self.num_minibatches, self.batch_size

        def contiguous_mbs(dataset):
            used = M * B
            return jax.tree.map(lambda x: x[:used].reshape((M, B) + x.shape[1:]), dataset)

        def prepare_fn(ts, traj):
            ts, dataset, valid_frac = prepare_batch(ts, traj, pid)
            if not self.shuffle:
                # minibatch layout is epoch-invariant: build it once here
                dataset = contiguous_mbs(dataset)
            return ts, dataset, valid_frac

        def shuffle_fn(dataset, key):
            # segment-level permutation gather — same math as the fused path's
            # make_epoch_minibatches (learning.py:351-358)
            perm = jax.random.permutation(key, num_segments)[: M * segs_per_mb]

            def gather(x):
                seg_view = x.reshape((num_segments, recurrence) + x.shape[1:])
                sel = jnp.take(seg_view, perm, axis=0)
                return sel.reshape((M, B) + x.shape[1:])

            return jax.tree.map(gather, dataset)

        def sgd_fn(ts, mbs, m, valid_frac, key):
            mb = jax.tree.map(lambda x: jax.lax.dynamic_index_in_dim(x, m, 0, keepdims=False), mbs)
            (ts, _), aux = sgd_step((ts, valid_frac), (mb, key))
            return ts, aux

        def lr_fn(ts, kls):
            return ts.replace(curr_lr=lr_after_epoch(cfg, ts.curr_lr, jnp.mean(kls)))

        self._prepare = jax.jit(prepare_fn)
        self._shuffle = jax.jit(shuffle_fn)
        self._sgd = jax.jit(sgd_fn)
        self._lr = jax.jit(lr_fn)
        self._mean = jax.jit(lambda xs: jnp.mean(jnp.stack(xs)))

        self._thunks: deque = deque()
        self._state: Dict[str, Any] = {}
        self._traj = None
        self._rng = np.random.default_rng(cfg.seed if cfg.seed is not None else 0)
        # dispatch accounting: quanta dispatched during rollouts (via idle_fn)
        # vs drained at flush() — the load-insensitive overlap signal
        # (tests assert on this instead of raw wall-clock ratios)
        self.total_quanta_enqueued = 0
        self.quanta_drained_at_flush = 0

    @property
    def pending(self) -> int:
        return len(self._thunks)

    def enqueue(self, ts: PolicyTrainState, traj: Dict[str, Any], key) -> None:
        """Queue the train step for `traj` as dispatchable quanta. The caller
        must flush() the previous train step first (one in flight at a time —
        the analog of --num_batches_to_accumulate=2 backpressure)."""
        assert not self._thunks, "flush() the previous train step before enqueue()"
        M, E = self.num_minibatches, self.num_epochs
        keys = list(jax.random.split(key, M * E))
        epoch_keys = list(jax.random.split(jax.random.fold_in(key, 0x5F), E))
        st = self._state = {
            "ts": ts, "dataset": None, "mbs": None, "vf": None, "aux": None, "stats_aux": None,
            "epoch_losses": [], "sgd_executed": 0, "epochs_executed": 0,
        }
        self._traj = traj
        # random-minibatch summaries (reference learner.py:693-703); if the
        # slot lands in an early-stopped epoch, flush() falls back to the last
        # executed quantum's aux — same spirit (a non-final-slot sample)
        stats_slot = int(self._rng.integers(0, M * E))

        def q_prepare():
            ts2, data, vf = self._prepare(st["ts"], traj)
            st.update(ts=ts2, vf=vf)
            if self.shuffle:
                st["dataset"] = data
            else:
                st["mbs"] = data

        self._thunks.append(q_prepare)
        qi = 0
        for e in range(E):
            if e >= 2:
                # early-stop gate (reference learner.py:827-837 / fused path
                # learning.py:368-390): epochs 0 and 1 always run; epoch e runs
                # only if the two previous epoch-mean policy losses differ by
                # more than the tolerance. The loss scalars were dispatched a
                # quantum ago (end of epoch e-1), so this host read is normally
                # a ready-future fetch, not a sync.
                def q_check():
                    l_prev2 = float(np.asarray(st["epoch_losses"][-2]))
                    l_prev1 = float(np.asarray(st["epoch_losses"][-1]))
                    if abs(l_prev2 - l_prev1) < self.early_stopping_tolerance:
                        self._thunks.clear()  # drop this train step's remaining quanta

                self._thunks.append(q_check)
            if self.shuffle:
                def q_shuffle(k_epoch=epoch_keys[e]):
                    st["mbs"] = self._shuffle(st["dataset"], k_epoch)

                self._thunks.append(q_shuffle)

            epoch_kls: list = []
            epoch_losses: list = []
            for m in range(M):
                def q_sgd(m=m, k=keys[qi], record=(qi == stats_slot), epoch_kls=epoch_kls, epoch_losses=epoch_losses):
                    ts2, aux = self._sgd(st["ts"], st["mbs"], m, st["vf"], k)
                    st["ts"] = ts2
                    st["aux"] = aux
                    st["sgd_executed"] += 1
                    if record:
                        st["stats_aux"] = aux
                    epoch_kls.append(aux["kl_divergence"])
                    epoch_losses.append(aux["policy_loss"])

                self._thunks.append(q_sgd)
                qi += 1

            def q_lr(epoch_kls=epoch_kls, epoch_losses=epoch_losses):
                st["ts"] = self._lr(st["ts"], jnp.stack(epoch_kls))
                st["epoch_losses"].append(self._mean(epoch_losses))
                st["epochs_executed"] += 1

            self._thunks.append(q_lr)
        # the assert above guarantees the queue was empty at entry, so every
        # thunk in it was added by this call (counter feeds overlap accounting)
        self.total_quanta_enqueued += len(self._thunks)

    def dispatch_one(self) -> bool:
        """Dispatch the next quantum (non-blocking). Returns True while more
        quanta remain. This is the sampler's idle_fn."""
        if self._thunks:
            self._thunks.popleft()()
        return bool(self._thunks)

    def flush(self) -> Tuple[PolicyTrainState, Dict[str, jnp.ndarray]]:
        """Dispatch any remaining quanta and return (train_state, stats) —
        still futures; nothing here blocks the host."""
        self.quanta_drained_at_flush += len(self._thunks)
        while self._thunks:
            self.dispatch_one()
        st = self._state
        self.last_sgd_steps_executed = st["sgd_executed"]
        self.last_skipped_sgd_steps = self.sgd_steps_per_train - st["sgd_executed"]
        aux = st["stats_aux"] if st["stats_aux"] is not None else st["aux"]
        stats = dict(aux)
        stats["epochs_executed"] = jnp.asarray(st["epochs_executed"], jnp.int32)
        stats["valids_fraction"] = st["vf"]
        stats["lr"] = st["ts"].curr_lr
        stats["version_diff_max"] = jnp.max(st["ts"].train_step - self._traj["policy_version"])
        return st["ts"], stats
