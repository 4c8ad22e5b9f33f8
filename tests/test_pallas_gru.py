"""Pallas fused-GRU sequence kernel vs the lax.scan reference.

On CPU the kernel runs in Pallas interpret mode — same program, interpreted —
so these tests validate kernel logic without a TPU. Differences vs the scan
are fp-reassociation drift amplified through the nonlinear recurrence
(~1e-6/step), so tolerances scale with T."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sample_factory_tpu.ops.pallas_gru import (
    _pick_batch_tile,
    gru_seq_reference,
    pallas_gru_seq,
    pallas_gru_supported,
)


def _inputs(T, B, H, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(T, B, 3 * H)).astype(dtype))
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    resets = jnp.asarray((rng.random((T, B)) < 0.2).astype(np.float32))
    wh = jnp.asarray((rng.normal(size=(H, 3 * H)) * 0.1).astype(dtype))
    bh = jnp.asarray((rng.normal(size=(3 * H,)) * 0.1).astype(dtype))
    return x, h0, resets, wh, bh


@pytest.mark.parametrize("T,B,H", [(5, 16, 128), (32, 16, 256), (7, 24, 128), (1, 8, 128)])
def test_forward_matches_scan(T, B, H):
    x, h0, resets, wh, bh = _inputs(T, B, H)
    o_ref, hf_ref = gru_seq_reference(x, h0, resets, wh, bh)
    o_k, hf_k = pallas_gru_seq(x, h0, resets, wh, bh)
    tol = 1e-4 * max(1, T // 4)
    np.testing.assert_allclose(np.asarray(o_k), np.asarray(o_ref), atol=tol)
    np.testing.assert_allclose(np.asarray(hf_k), np.asarray(hf_ref), atol=tol)


def test_resets_zero_carry_not_output():
    """Output at step t is pre-reset; the carry into t+1 is zeroed."""
    T, B, H = 3, 8, 128
    x, h0, _, wh, bh = _inputs(T, B, H, seed=3)
    resets = jnp.zeros((T, B)).at[1, :].set(1.0)  # reset after consuming step 1
    o_k, _ = pallas_gru_seq(x, h0, resets, wh, bh)
    # recompute step 2 by hand with a zero carry
    o_ref, _ = gru_seq_reference(x, h0, resets, wh, bh)
    np.testing.assert_allclose(np.asarray(o_k[2]), np.asarray(o_ref[2]), atol=1e-4)
    assert not np.allclose(np.asarray(o_k[1]), 0.0)  # outputs are NOT zeroed


def test_gradients_match_scan():
    T, B, H = 6, 16, 128
    x, h0, resets, wh, bh = _inputs(T, B, H, seed=5)

    def loss(fn, x, h0, wh, bh):
        o, hf = fn(x, h0, resets, wh, bh)
        return jnp.sum(o**2) + jnp.sum(hf)

    g_k = jax.grad(lambda *a: loss(pallas_gru_seq, *a), argnums=(0, 1, 2, 3))(x, h0, wh, bh)
    g_r = jax.grad(lambda *a: loss(gru_seq_reference, *a), argnums=(0, 1, 2, 3))(x, h0, wh, bh)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def test_supported_gate():
    assert _pick_batch_tile(512) == 512 and _pick_batch_tile(24) == 8 and _pick_batch_tile(7) == 0
    # aligned shapes are supported exactly on the TPU backend (CPU falls back to scan)
    assert pallas_gru_supported(32, 512, 256) == (jax.default_backend() == "tpu")
    # misaligned shapes are never supported, any backend
    assert not pallas_gru_supported(32, 7, 256)
    assert not pallas_gru_supported(32, 512, 200)


def test_cell_integration_cpu_falls_back():
    """FusedGRUCell still runs (scan fallback) on CPU with the flag on."""
    from sample_factory_tpu.ops.rnn_cells import FusedGRUCell

    cell = FusedGRUCell(features=128)
    x = jnp.ones((4, 8, 32))
    h = jnp.zeros((8, 128))
    resets = jnp.zeros((4, 8))
    params = cell.init(jax.random.PRNGKey(0), x, h, resets=resets, seq=True)
    outs, hf = cell.apply(params, x, h, resets=resets, seq=True)
    assert outs.shape == (4, 8, 128) and hf.shape == (8, 128)


@pytest.mark.parametrize("T,B,H", [(5, 16, 128), (16, 8, 256)])
def test_lstm_forward_and_grads_match_scan(T, B, H):
    from sample_factory_tpu.ops.pallas_gru import lstm_seq_reference, pallas_lstm_seq

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(T, B, 4 * H)).astype(np.float32))
    hc0 = jnp.asarray(rng.normal(size=(B, 2 * H)).astype(np.float32))
    resets = jnp.asarray((rng.random((T, B)) < 0.2).astype(np.float32))
    wh = jnp.asarray((rng.normal(size=(H, 4 * H)) * 0.1).astype(np.float32))

    o_ref, hc_ref = lstm_seq_reference(x, hc0, resets, wh)
    o_k, hc_k = pallas_lstm_seq(x, hc0, resets, wh)
    tol = 1e-4 * max(1, T // 4)
    np.testing.assert_allclose(np.asarray(o_k), np.asarray(o_ref), atol=tol)
    np.testing.assert_allclose(np.asarray(hc_k), np.asarray(hc_ref), atol=tol)

    def loss(fn, x, hc0, wh):
        o, hc = fn(x, hc0, resets, wh)
        return jnp.sum(o**2) + jnp.sum(hc)

    g_k = jax.grad(lambda *a: loss(pallas_lstm_seq, *a), argnums=(0, 1, 2))(x, hc0, wh)
    g_r = jax.grad(lambda *a: loss(lstm_seq_reference, *a), argnums=(0, 1, 2))(x, hc0, wh)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3)
