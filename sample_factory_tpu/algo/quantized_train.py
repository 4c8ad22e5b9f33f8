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

Restrictions (both host-checked):
  - shuffle_minibatches is not supported: contiguous minibatch slicing keeps
    a quantum a pure dynamic-slice (the reference's default is also
    no-shuffle, cfg.py --shuffle_minibatches "slow operation");
  - the epoch early-stop heuristic (reference learner.py:827-837) does not
    apply — all epochs always run.
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
    def __init__(self, cfg, env_info, model, tx, policy_id: int = 0, num_envs: Optional[int] = None):
        assert not cfg.shuffle_minibatches, "QuantizedTrainer requires --shuffle_minibatches=False"
        self.cfg = cfg
        sgd_step, prepare_batch = build_train_pieces(cfg, env_info, model, tx, policy_id)

        n = num_envs if num_envs is not None else cfg.num_envs
        dataset_size = n * cfg.rollout
        self.batch_size = min(cfg.batch_size, dataset_size)
        self.num_minibatches = dataset_size // self.batch_size
        self.num_epochs = cfg.num_epochs
        # train_step advances one per sgd quantum — lets the runner mirror the
        # policy version on the host without a device sync
        self.sgd_steps_per_train = self.num_minibatches * self.num_epochs
        pid = policy_id
        M, B = self.num_minibatches, self.batch_size

        def prepare_fn(ts, traj):
            ts, dataset, valid_frac = prepare_batch(ts, traj, pid)
            used = M * B
            mbs = jax.tree.map(lambda x: x[:used].reshape((M, B) + x.shape[1:]), dataset)
            return ts, mbs, valid_frac

        def sgd_fn(ts, mbs, m, valid_frac, key):
            mb = jax.tree.map(lambda x: jax.lax.dynamic_index_in_dim(x, m, 0, keepdims=False), mbs)
            (ts, _), aux = sgd_step((ts, valid_frac), (mb, key))
            return ts, aux

        def lr_fn(ts, kls):
            return ts.replace(curr_lr=lr_after_epoch(cfg, ts.curr_lr, jnp.mean(kls)))

        self._prepare = jax.jit(prepare_fn)
        self._sgd = jax.jit(sgd_fn)
        self._lr = jax.jit(lr_fn)

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
        n_thunks_at_entry = len(self._thunks)
        keys = list(jax.random.split(key, M * E))
        st = self._state = {"ts": ts, "mbs": None, "vf": None, "aux": None, "stats_aux": None}
        self._traj = traj
        # random-minibatch summaries (reference learner.py:693-703)
        stats_slot = int(self._rng.integers(0, M * E))

        def q_prepare():
            ts2, mbs, vf = self._prepare(st["ts"], traj)
            st.update(ts=ts2, mbs=mbs, vf=vf)

        self._thunks.append(q_prepare)
        qi = 0
        for _e in range(E):
            epoch_kls: list = []
            for m in range(M):
                def q_sgd(m=m, k=keys[qi], record=(qi == stats_slot), epoch_kls=epoch_kls):
                    ts2, aux = self._sgd(st["ts"], st["mbs"], m, st["vf"], k)
                    st["ts"] = ts2
                    st["aux"] = aux
                    if record:
                        st["stats_aux"] = aux
                    epoch_kls.append(aux["kl_divergence"])

                self._thunks.append(q_sgd)
                qi += 1

            def q_lr(epoch_kls=epoch_kls):
                st["ts"] = self._lr(st["ts"], jnp.stack(epoch_kls))

            self._thunks.append(q_lr)
        # count only quanta added by THIS call — callers normally flush()
        # first, but if undrained thunks remain they must not be re-counted
        # (the counter feeds overlap-fraction accounting)
        self.total_quanta_enqueued += len(self._thunks) - n_thunks_at_entry

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
        aux = st["stats_aux"] if st["stats_aux"] is not None else st["aux"]
        stats = dict(aux)
        stats["epochs_executed"] = jnp.asarray(self.num_epochs, jnp.int32)
        stats["valids_fraction"] = st["vf"]
        stats["lr"] = st["ts"].curr_lr
        stats["version_diff_max"] = jnp.max(st["ts"].train_step - self._traj["policy_version"])
        return st["ts"], stats
