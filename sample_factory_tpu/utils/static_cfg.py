"""Hashable, attribute-access config wrapper for use inside flax modules.

Flax module attributes that are plain dicts get converted to FrozenDicts (and
treated as pytrees); wrapping the cfg in this non-dict container keeps it a
static leaf usable as a jit-static argument.
"""

from __future__ import annotations

from typing import Any, Dict


class StaticConfig:
    __slots__ = ("_d", "_h")

    def __init__(self, d: Dict[str, Any]):
        if isinstance(d, StaticConfig):
            d = d._d
        object.__setattr__(self, "_d", dict(d))
        object.__setattr__(self, "_h", None)

    def __getattr__(self, key):
        try:
            return self._d[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __getitem__(self, key):
        return self._d[key]

    def get(self, key, default=None):
        return self._d.get(key, default)

    def __contains__(self, key):
        return key in self._d

    def to_dict(self) -> Dict[str, Any]:
        return dict(self._d)

    def _hashable_items(self):
        def freeze(v):
            if isinstance(v, list):
                return tuple(freeze(x) for x in v)
            if isinstance(v, dict):
                return tuple(sorted((k, freeze(x)) for k, x in v.items()))
            return v

        return tuple(sorted((k, freeze(v)) for k, v in self._d.items()))

    def __hash__(self):
        if self._h is None:
            object.__setattr__(self, "_h", hash(self._hashable_items()))
        return self._h

    def __eq__(self, other):
        return isinstance(other, StaticConfig) and self._hashable_items() == other._hashable_items()

    def __repr__(self):
        return f"StaticConfig({self._d!r})"
