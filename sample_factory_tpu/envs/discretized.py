"""Discretized continuous action space.

Parity: reference `sample_factory/algo/utils/spaces/discretized.py` — a
Discrete space whose n bins map linearly onto [min_action, max_action]
(used e.g. by the ViZDoom integration for continuous aim deltas). The
framework treats it as Discrete (the static-spec conversion in
envs/spaces.py sees the Discrete base class); `to_continuous` is for the
env side when executing the chosen bin.
"""

from __future__ import annotations

from gymnasium.spaces import Discrete


class Discretized(Discrete):
    def __init__(self, n: int, min_action: float, max_action: float):
        super().__init__(n)
        self.min_action = min_action
        self.max_action = max_action

    def to_continuous(self, discrete_action):
        step = (self.max_action - self.min_action) / (self.n - 1)
        return self.min_action + discrete_action * step
