"""Runner-side stats: windowed episode metrics, FPS windows, summary writers.

Parity: reference `sample_factory/algo/runners/runner.py:119-142` (deques,
fps over 10s/60s/5min windows), `:291-343` (console report), `:368-423`
(tensorboard summaries per policy). Summaries go to a JSONL file always, and
to TensorBoard if torch.utils.tensorboard is importable (torch is a CPU-only
host dependency here).
"""

from __future__ import annotations

import json
import time
from collections import deque
from os.path import join
from typing import Deque, Dict, Optional, Tuple

from sample_factory_tpu.utils.utils import log, summaries_dir


class FpsTracker:
    def __init__(self, windows=(10, 60, 300)):
        self.windows = windows
        self.history: Deque[Tuple[float, int]] = deque(maxlen=10000)

    def add(self, now: float, env_steps: int) -> None:
        self.history.append((now, env_steps))

    def fps(self, window: float) -> float:
        if not self.history:
            return 0.0
        now, latest = self.history[-1]
        past = None
        for t, steps in self.history:
            if now - t <= window:
                past = (t, steps)
                break
        if past is None or now - past[0] <= 0:
            return 0.0
        return (latest - past[1]) / (now - past[0])


class EpisodeStats:
    """Windowed averages over completed episodes (reference stats_avg deques)."""

    def __init__(self, stats_avg: int = 100):
        self.rewards: Deque[float] = deque(maxlen=stats_avg)
        self.lengths: Deque[float] = deque(maxlen=stats_avg)
        self.total_episodes = 0

    def add_rollout_stats(self, count: float, return_sum: float, len_sum: float) -> None:
        # device-side aggregation gives us sums over completed episodes in the
        # rollout; distribute as `count` identical pseudo-episodes to keep the
        # windowed average faithful
        n = int(count)
        if n <= 0:
            return
        avg_r, avg_l = return_sum / n, len_sum / n
        for _ in range(min(n, self.rewards.maxlen)):
            self.rewards.append(avg_r)
            self.lengths.append(avg_l)
        self.total_episodes += n

    @property
    def avg_reward(self) -> Optional[float]:
        return sum(self.rewards) / len(self.rewards) if self.rewards else None

    @property
    def avg_length(self) -> Optional[float]:
        return sum(self.lengths) / len(self.lengths) if self.lengths else None


class SummaryWriter:
    def __init__(self, cfg, policy_id: int = 0):
        self.cfg = cfg
        # stats fed to writers are already GLOBAL on every host — device-env
        # runners get cross-host episode sums out of the SPMD program itself,
        # host-env runners all-reduce them (multihost.AmortizedEpisodeSums
        # in HostEnvRunner/HostMultiPolicyRunner.run) — so on multihost runs
        # only host 0 writes: summary dirs live on a shared filesystem and N
        # identical writers would clobber each other
        from sample_factory_tpu.parallel.multihost import is_primary_host

        self._noop = not is_primary_host()
        self._jsonl = None
        self._tb = None
        if self._noop:
            return
        self.dir = summaries_dir(cfg, policy_id)
        self.jsonl_path = join(self.dir, "summaries.jsonl")
        self._jsonl = open(self.jsonl_path, "a")
        try:
            from torch.utils.tensorboard import SummaryWriter as TbWriter

            self._tb = TbWriter(log_dir=self.dir, flush_secs=cfg.flush_summaries_interval)
        except Exception:  # noqa: BLE001 - tensorboard optional
            log.debug("tensorboard not available; writing JSONL summaries only")

    def write(self, env_steps: int, scalars: Dict[str, float], prefix: str = "train") -> None:
        if self._noop:
            return
        record = {"env_steps": env_steps, "time": time.time()}
        record.update({f"{prefix}/{k}": v for k, v in scalars.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{prefix}/{k}", v, env_steps)

    def add_scalar(self, key: str, value: float, env_steps: int) -> None:
        """tensorboardX-compatible single-scalar write (used by AlgoObserver
        extra_summaries hooks, reference runner.py:70-73)."""
        if self._noop:
            return
        self._jsonl.write(json.dumps({"env_steps": env_steps, "time": time.time(), key: float(value)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(key, value, env_steps)

    def flush(self) -> None:
        if self._noop:
            return
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._noop:
            return
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
