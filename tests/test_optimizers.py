"""LAMB + Lookahead vs a numpy oracle of the reference formulas.

Reference `sample_factory/algo/utils/optimizers.py` Lamb: adam step with bias
correction + decoupled weight decay, trust ratio min(||w||,10)/||step||
clamped to [min_trust, 1/min_trust], and optional Lookahead (slow weights
synced every look_ahead_k updates with factor look_ahead_alpha; the step
counter starts at 0 so the FIRST update also syncs). The oracle below
re-implements those published formulas in float64 numpy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from sample_factory_tpu.algo.optimizers import lookahead, make_optimizer, scale_by_lamb_trust


class _LambOracle:
    """Reference Lamb in numpy (f64), one flat param."""

    def __init__(self, p, lr, b1=0.9, b2=0.999, eps=1e-6, weight_decay=1e-4, min_trust=0.01,
                 use_look_ahead=False, alpha=0.5, k=10):
        self.p = p.astype(np.float64).copy()
        self.m = np.zeros_like(self.p)
        self.v = np.zeros_like(self.p)
        self.t = 0
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.wd, self.min_trust = weight_decay, min_trust
        self.use_la, self.alpha, self.k = use_look_ahead, alpha, k
        self.slow = self.p.copy()

    def step(self, g):
        g = g.astype(np.float64)
        self.m = self.b1 * self.m + (1 - self.b1) * g
        self.v = self.b2 * self.v + (1 - self.b2) * g * g
        bc1 = 1 - self.b1 ** (self.t + 1)
        bc2 = 1 - self.b2 ** (self.t + 1)
        step = (self.m / bc1) / (np.sqrt(self.v) / np.sqrt(bc2) + self.eps)
        step = step + self.wd * self.p
        wn = np.linalg.norm(self.p)
        sn = np.linalg.norm(step)
        if wn == 0 or sn == 0:
            trust = 1.0
        else:
            trust = np.clip(min(wn, 10.0) / max(sn, 1e-20), self.min_trust, 1.0 / self.min_trust)
        self.p = self.p - self.lr * trust * step
        if self.use_la and (self.t % self.k) == 0:
            self.slow = (1 - self.alpha) * self.slow + self.alpha * self.p
            self.p = self.slow.copy()
        self.t += 1


def _run_optax(tx, p0, grads):
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    return np.asarray(params["w"])


def test_lamb_matches_reference_formulas():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(24,)).astype(np.float32)
    grads = [rng.normal(size=(24,)).astype(np.float32) for _ in range(15)]
    lr = 0.03

    tx = optax.chain(scale_by_lamb_trust(), optax.scale_by_learning_rate(lr))
    ours = _run_optax(tx, p0, grads)

    oracle = _LambOracle(p0, lr)
    for g in grads:
        oracle.step(g)
    np.testing.assert_allclose(ours, oracle.p, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("k,alpha", [(10, 0.5), (4, 0.25)])
def test_lamb_lookahead_matches_reference(k, alpha):
    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(16,)).astype(np.float32)
    grads = [rng.normal(size=(16,)).astype(np.float32) for _ in range(2 * k + 3)]
    lr = 0.05

    tx = optax.chain(scale_by_lamb_trust(), optax.scale_by_learning_rate(lr), lookahead(k=k, alpha=alpha))
    ours = _run_optax(tx, p0, grads)

    oracle = _LambOracle(p0, lr, use_look_ahead=True, alpha=alpha, k=k)
    for g in grads:
        oracle.step(g)
    np.testing.assert_allclose(ours, oracle.p, rtol=3e-4, atol=3e-5)
    # and it is NOT the plain-lamb trajectory (lookahead changed the path)
    tx2 = optax.chain(scale_by_lamb_trust(), optax.scale_by_learning_rate(lr))
    plain = _run_optax(tx2, p0, grads)
    assert not np.allclose(ours, plain, atol=1e-5)


def test_lamb_lookahead_cfg_flag():
    from sample_factory_tpu.cfg.arguments import default_cfg

    cfg = default_cfg(env="t", argv=["--optimizer=lamb", "--lamb_lookahead=True", "--seed=0"])
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.ones((4,)) * 0.1}, state, params)
    params2 = optax.apply_updates(params, updates)
    assert np.all(np.isfinite(np.asarray(params2["w"])))
    # the inner chain's terminal transform carries slow weights
    leaves = jax.tree.leaves(state)
    assert any(np.asarray(l).shape == (4,) for l in leaves)
