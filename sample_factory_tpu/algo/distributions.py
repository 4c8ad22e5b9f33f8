"""Action distributions: categorical (with masking), diagonal Gaussian, tuple.

Parity: reference `sample_factory/algo/utils/action_distributions.py` —
`get_action_distribution` (:45), masked softmax (:84-95), Categorical
(:100-196), Tuple (:197-286), Continuous (:290-323). Fresh JAX implementation:
distributions are lightweight wrappers over traced arrays, created and consumed
inside jit; sampling takes an explicit PRNG key.

Conventions (match the reference trajectory schema):
  - actions always carry a trailing action dim: Discrete -> [..., 1],
    Box(d) -> [..., d], Tuple -> [..., sum(num_actions)]
  - log_prob/entropy/kl return shape [...] (no trailing dim)
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from sample_factory_tpu.envs.spaces import (
    Box,
    Discrete,
    TupleSpec,
    num_action_parameters,
    num_actions,
)


def masked_softmax(logits, mask):
    logits = jnp.where(mask == 0, -1e9, logits)
    p = jax.nn.softmax(logits, axis=-1)
    p = p * mask
    return p / (jnp.sum(p, axis=-1, keepdims=True) + 1e-13)


def masked_log_softmax(logits, mask):
    logits = jnp.where(mask == 0, -1e9, logits)
    return jax.nn.log_softmax(logits, axis=-1)


class CategoricalDistribution:
    def __init__(self, raw_logits, action_mask=None):
        self.raw_logits = raw_logits
        self.action_mask = action_mask
        self._p = None
        self._log_p = None

    @property
    def num_categories(self) -> int:
        return self.raw_logits.shape[-1]

    @property
    def probs(self):
        if self._p is None:
            if self.action_mask is not None:
                self._p = masked_softmax(self.raw_logits, self.action_mask)
            else:
                self._p = jax.nn.softmax(self.raw_logits, axis=-1)
        return self._p

    @property
    def log_probs_tensor(self):
        if self._log_p is None:
            if self.action_mask is not None:
                self._log_p = masked_log_softmax(self.raw_logits, self.action_mask)
            else:
                self._log_p = jax.nn.log_softmax(self.raw_logits, axis=-1)
        return self._log_p

    def sample(self, key):
        """Gumbel-max sampling (same trick as reference sample_gumbel, robust under masking)."""
        logits = self.log_probs_tensor if self.action_mask is not None else self.raw_logits
        gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape, minval=1e-20) + 1e-20) + 1e-20)
        sample = jnp.argmax(logits + gumbel, axis=-1)
        return sample[..., None].astype(jnp.int32)

    def argmax(self):
        return jnp.argmax(self.probs, axis=-1)[..., None].astype(jnp.int32)

    def log_prob(self, actions):
        a = actions[..., 0].astype(jnp.int32)
        return jnp.take_along_axis(self.log_probs_tensor, a[..., None], axis=-1)[..., 0]

    def entropy(self):
        p_log_p = self.log_probs_tensor * self.probs
        return -jnp.sum(p_log_p, axis=-1)

    def kl_divergence(self, other: "CategoricalDistribution"):
        return jnp.sum(self.probs * (self.log_probs_tensor - other.log_probs_tensor), axis=-1)

    def symmetric_kl_with_uniform_prior(self):
        n = self.num_categories
        log_uniform = math.log(1.0 / n)
        probs, log_probs = self.probs, self.log_probs_tensor
        fwd = jnp.sum(probs * (log_probs - log_uniform), axis=-1)
        bwd = jnp.sum((1.0 / n) * (log_uniform - log_probs), axis=-1)
        return 0.5 * (fwd + bwd)


class ContinuousDistribution:
    """Diagonal Gaussian over flat Box actions (Independent Normal)."""

    stddev_min: float = 1e-4
    stddev_max: float = 1e4

    def __init__(self, params):
        # params [..., 2d] = concat(means, log_std)
        d = params.shape[-1] // 2
        self.means = params[..., :d]
        self.log_std = params[..., d:]
        self.stddevs = jnp.clip(jnp.exp(self.log_std), self.stddev_min, self.stddev_max)

    def sample(self, key):
        eps = jax.random.normal(key, self.means.shape, dtype=self.means.dtype)
        return self.means + self.stddevs * eps

    def argmax(self):
        return self.means

    def log_prob(self, actions):
        var = jnp.square(self.stddevs)
        log_det = jnp.log(self.stddevs)
        lp = -0.5 * jnp.square(actions - self.means) / var - log_det - 0.5 * math.log(2 * math.pi)
        return jnp.sum(lp, axis=-1)

    def entropy(self):
        per_dim = 0.5 + 0.5 * math.log(2 * math.pi) + jnp.log(self.stddevs)
        return jnp.sum(per_dim, axis=-1)

    def kl_divergence(self, other: "ContinuousDistribution"):
        var, other_var = jnp.square(self.stddevs), jnp.square(other.stddevs)
        kl = (
            jnp.log(other.stddevs / self.stddevs)
            + (var + jnp.square(self.means - other.means)) / (2.0 * other_var)
            - 0.5
        )
        return jnp.sum(kl, axis=-1)

    def symmetric_kl_with_uniform_prior(self):
        # matches reference behavior: continuous dists use entropy-based exploration;
        # symmetric KL with a uniform prior is undefined, fall back to negative entropy
        return -self.entropy()


class TupleDistribution:
    """Tuple of independent action distributions (reference :197-286)."""

    def __init__(self, space: TupleSpec, logits_flat, action_mask: Optional[Sequence] = None):
        self.space = space
        self.logit_lengths = [num_action_parameters(s) for s in space.spaces]
        self.action_lengths = [num_actions(s) for s in space.spaces]
        self.distributions = []
        offset = 0
        for i, s in enumerate(space.spaces):
            chunk = logits_flat[..., offset : offset + self.logit_lengths[i]]
            offset += self.logit_lengths[i]
            mask = action_mask[i] if action_mask is not None else None
            self.distributions.append(get_action_distribution(s, chunk, mask))

    def _split_actions(self, actions):
        out, offset = [], 0
        for length in self.action_lengths:
            out.append(actions[..., offset : offset + length])
            offset += length
        return out

    def sample(self, key):
        keys = jax.random.split(key, len(self.distributions))
        parts = [d.sample(k).astype(jnp.float32) for d, k in zip(self.distributions, keys)]
        return jnp.concatenate(parts, axis=-1)

    def argmax(self):
        parts = [d.argmax().astype(jnp.float32) for d in self.distributions]
        return jnp.concatenate(parts, axis=-1)

    def log_prob(self, actions):
        parts = self._split_actions(actions)
        lps = [d.log_prob(a) for d, a in zip(self.distributions, parts)]
        return sum(lps)

    def entropy(self):
        return sum(d.entropy() for d in self.distributions)

    def kl_divergence(self, other: "TupleDistribution"):
        return sum(d.kl_divergence(o) for d, o in zip(self.distributions, other.distributions))

    def symmetric_kl_with_uniform_prior(self):
        return sum(d.symmetric_kl_with_uniform_prior() for d in self.distributions)


def get_action_distribution(space, raw_logits, action_mask=None):
    assert num_action_parameters(space) == raw_logits.shape[-1], (
        f"expected {num_action_parameters(space)} action params for {space}, got {raw_logits.shape[-1]}"
    )
    if isinstance(space, Discrete):
        return CategoricalDistribution(raw_logits, action_mask)
    if isinstance(space, TupleSpec):
        return TupleDistribution(space, raw_logits, action_mask)
    if isinstance(space, Box):
        return ContinuousDistribution(raw_logits)
    raise NotImplementedError(f"Action space {space!r} not supported")


def sample_actions_log_probs(distribution, key):
    actions = distribution.sample(key)
    return actions, distribution.log_prob(actions)


def argmax_actions(distribution):
    return distribution.argmax()
