"""Pallas TPU kernel for the fused GRU sequence (the BPTT hot loop).

The learner's recurrent core processes [T, B] segments with a sequential
dependence on T (`ops/rnn_cells.py`). The lax.scan formulation already
hoists the input projection into one big MXU matmul; what remains per step
is a small [B, H] x [H, 3H] matmul plus gates. Under scan, XLA round-trips
the hidden state and re-stages operands every iteration; this kernel keeps
the recurrent weights AND the hidden state resident in VMEM for the whole
sequence:

  grid = (num_batch_tiles, T)   # T is the minor (fastest) grid dim; TPU
                                # executes the grid sequentially, so VMEM
                                # scratch persists across T iterations
  x_proj blocks [1, BT, 3H] stream in double-buffered by the Pallas
  pipeline while step t computes — the classic overlapped recurrence.

Gate math is identical to FusedGRUCell._gates (cuDNN layout [r, z, n]):
  r = sigmoid(xr + hr); z = sigmoid(xz + hz); n = tanh(xn + r * hn)
  new_h = (1 - z) * n + z * h
with h_proj = h @ wh + bh (bh inside the reset product, as in cuDNN), and
done-masked state resets BETWEEN steps (output at t is pre-reset, the carry
is zeroed where resets[t] > 0 — reference rnn_utils.py zeroes hidden state
at episode starts; here the mask arrives as "reset AFTER consuming step t").

Gradients: jax.custom_vjp — forward runs the kernel, backward rematerializes
through the mathematically-identical lax.scan reference implementation
(recompute-in-backward, the standard trade for sequence kernels; the scan
backward is XLA-autodiff'd and already well-fused).

Used by FusedGRUCell when `--pallas_rnn=True` AND `pallas_gru_supported()`
(TPU backend, aligned shapes); lax.scan otherwise. OFF by default since r5:
with honest fetch-barrier timing (bench.py `_fetch_barrier`; the earlier
"+12% e2e / 1.29x kernel" numbers were dispatch-rate artifacts of the
tunnel's non-blocking block_until_ready), the XLA scan formulation measures
FASTER on v5e for the tested shapes (32x512x256: scan 362 us vs kernel
499 us; grid_battle e2e 1.675M vs 1.629M steps/s). The kernel is kept as an
experimentation surface — docs/evidence/bench_r5_honest.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gru_seq_reference(x_proj, h0, resets, wh, bh):
    """lax.scan reference — the exact math of FusedGRUCell's seq branch.
    Uses the same explicit-sigmoid formulation as the Pallas kernel so the
    custom_vjp backward rematerializes the same bf16 trajectory the kernel
    produced (jax.nn.sigmoid and the manual form round differently in bf16)."""
    dtype = x_proj.dtype

    def step(carry, inp):
        x_p, reset = inp
        h_proj = carry.astype(dtype) @ wh + bh
        xr, xz, xn = jnp.split(x_p, 3, axis=-1)
        hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
        r = _kernel_sigmoid(xr + hr)
        z = _kernel_sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        one = jnp.asarray(1.0, dtype)
        new_h = ((one - z) * n + z * carry.astype(dtype)).astype(jnp.float32)
        carried = jnp.where(reset[:, None] > 0, jnp.zeros_like(new_h), new_h)
        return carried, new_h

    h_final, outs = jax.lax.scan(step, h0, (x_proj, resets))
    return outs, h_final


def _kernel_sigmoid(x):
    """Mosaic-safe sigmoid: jax.nn.sigmoid lowers an f32 scalar broadcast
    into bf16 vectors, which Mosaic rejects ('vector.broadcast' element-type
    verification); explicit dtype-matched constants avoid it."""
    one = jnp.asarray(1.0, x.dtype)
    return one / (one + jnp.exp(-x))


def _gru_kernel(x_ref, r_ref, h0_ref, wh_ref, bh_ref, out_ref, hfin_ref, h_scr):
    from jax.experimental import pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    dtype = x_ref.dtype
    # Gate math runs in the input dtype to match gru_seq_reference exactly
    # (bf16 configs: same rounding per step, so the custom_vjp backward remat
    # differentiates the same trajectory the kernel produced). f32 is kept
    # only for the MXU accumulation and the carried state.
    h_proj = jnp.dot(h.astype(dtype), wh_ref[:], preferred_element_type=jnp.float32).astype(dtype) + bh_ref[0]
    x_proj = x_ref[0]
    H = h.shape[-1]
    xr, xz, xn = x_proj[:, :H], x_proj[:, H : 2 * H], x_proj[:, 2 * H :]
    hr, hz, hn = h_proj[:, :H], h_proj[:, H : 2 * H], h_proj[:, 2 * H :]
    r = _kernel_sigmoid(xr + hr)
    z = _kernel_sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    one = jnp.asarray(1.0, dtype)
    new_h = ((one - z) * n + z * h.astype(dtype)).astype(jnp.float32)
    out_ref[0] = new_h
    reset = r_ref[0]  # [BT, 1], broadcasts over H
    h_scr[:] = jnp.where(reset > 0, jnp.zeros_like(new_h), new_h)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        hfin_ref[:] = h_scr[:]


def _pick_batch_tile(B: int) -> int:
    for bt in (512, 256, 128, 64, 32, 16, 8):
        if B % bt == 0:
            return bt
    return 0


def pallas_gru_supported(T: int, B: int, H: int, dtype=jnp.float32) -> bool:
    """TPU backend + tileable shapes (B a multiple of 8 — 16 for bf16 whose
    min sublane tile is 16 — and H a multiple of 128)."""
    try:
        backend_ok = jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        backend_ok = False
    bt = _pick_batch_tile(B)
    sublane = 16 if jnp.dtype(dtype).itemsize == 2 else 8
    return backend_ok and bt > 0 and bt % sublane == 0 and H % 128 == 0 and T >= 1


def _gru_seq_pallas_raw(x_proj, h0, resets, wh, bh, *, interpret=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        # tests exercise the kernel on CPU via the interpreter
        interpret = jax.default_backend() != "tpu"

    T, B, G = x_proj.shape
    H = h0.shape[-1]
    assert G == 3 * H
    BT = _pick_batch_tile(B)
    assert BT > 0, f"batch {B} not tileable"
    nB = B // BT

    bh2 = bh.reshape(1, G)
    resets3 = resets.reshape(T, B, 1)  # 3-D so the block's minor dims tile legally
    outs, h_final = pl.pallas_call(
        _gru_kernel,
        grid=(nB, T),  # T minor: sequential on TPU, h_scr carries across t
        in_specs=[
            pl.BlockSpec((1, BT, G), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, 1), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((BT, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * 3 * H + 10 * T * B * H,
            bytes_accessed=4 * (T * B * 3 * H + T * B * H + H * 3 * H),
            transcendentals=3 * T * B * H,
        ),
        interpret=interpret,
    )(x_proj, resets3, h0, wh, bh2)
    return outs, h_final


@jax.custom_vjp
def pallas_gru_seq(x_proj, h0, resets, wh, bh):
    """(x_proj [T,B,3H], h0 [B,H] f32, resets [T,B] float, wh [H,3H], bh [3H])
    -> (outs [T,B,H] f32, h_final [B,H] f32)"""
    return _gru_seq_pallas_raw(x_proj, h0, resets, wh, bh)


def _fwd(x_proj, h0, resets, wh, bh):
    outs = pallas_gru_seq(x_proj, h0, resets, wh, bh)
    return outs, (x_proj, h0, resets, wh, bh)


def _bwd(residuals, cotangents):
    x_proj, h0, resets, wh, bh = residuals
    # rematerialize: backward through the scan reference (identical math)
    _, vjp_fn = jax.vjp(lambda xp, h, w, b: gru_seq_reference(xp, h, resets, w, b), x_proj, h0, wh, bh)
    d_x_proj, d_h0, d_wh, d_bh = vjp_fn(cotangents)
    return d_x_proj, d_h0, jnp.zeros_like(resets), d_wh, d_bh


pallas_gru_seq.defvjp(_fwd, _bwd)


# ----------------------------------------------------------------- LSTM


def lstm_seq_reference(x_proj, hc0, resets, wh, wh_dtype_matmul=True):
    """lax.scan reference — the exact math of FusedLSTMCell's seq branch.
    State = concat[h, c]; gate layout [i, f, g, o], forget bias 1.0; bi is
    already folded into x_proj by the caller (as in FusedLSTMCell)."""
    dtype = x_proj.dtype
    H = hc0.shape[-1] // 2

    def step(carry, inp):
        x_p, reset = inp
        h, c = carry[:, :H], carry[:, H:]
        proj = x_p + h.astype(dtype) @ wh
        i, f, g, o = jnp.split(proj, 4, axis=-1)
        one = jnp.asarray(1.0, dtype)
        new_c = _kernel_sigmoid(f + one) * c.astype(dtype) + _kernel_sigmoid(i) * jnp.tanh(g)
        new_h = _kernel_sigmoid(o) * jnp.tanh(new_c)
        new_hc = jnp.concatenate([new_h, new_c], axis=-1).astype(jnp.float32)
        carried = jnp.where(reset[:, None] > 0, jnp.zeros_like(new_hc), new_hc)
        return carried, new_h.astype(jnp.float32)

    hc_final, outs = jax.lax.scan(step, hc0, (x_proj, resets))
    return outs, hc_final


def _lstm_kernel(x_ref, r_ref, hc0_ref, wh_ref, out_ref, hcfin_ref, hc_scr):
    from jax.experimental import pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        hc_scr[:] = hc0_ref[:]

    dtype = x_ref.dtype
    H = wh_ref.shape[0]
    hc = hc_scr[:]
    h, c = hc[:, :H], hc[:, H:]
    # Input-dtype gate math, matching lstm_seq_reference (see GRU kernel note);
    # f32 only for MXU accumulation and the carried [h, c] state.
    proj = x_ref[0] + jnp.dot(h.astype(dtype), wh_ref[:], preferred_element_type=jnp.float32).astype(dtype)
    i, f, g, o = proj[:, :H], proj[:, H : 2 * H], proj[:, 2 * H : 3 * H], proj[:, 3 * H :]
    one = jnp.asarray(1.0, dtype)
    new_c = _kernel_sigmoid(f + one) * c.astype(dtype) + _kernel_sigmoid(i) * jnp.tanh(g)
    new_h = _kernel_sigmoid(o) * jnp.tanh(new_c)
    out_ref[0] = new_h.astype(jnp.float32)
    new_hc = jnp.concatenate([new_h, new_c], axis=-1).astype(jnp.float32)
    reset = r_ref[0]  # [BT, 1]
    hc_scr[:] = jnp.where(reset > 0, jnp.zeros_like(new_hc), new_hc)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        hcfin_ref[:] = hc_scr[:]


def _lstm_seq_pallas_raw(x_proj, hc0, resets, wh, *, interpret=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    T, B, G = x_proj.shape
    H = hc0.shape[-1] // 2
    assert G == 4 * H
    BT = _pick_batch_tile(B)
    assert BT > 0, f"batch {B} not tileable"
    nB = B // BT

    resets3 = resets.reshape(T, B, 1)
    outs, hc_final = pl.pallas_call(
        _lstm_kernel,
        grid=(nB, T),
        in_specs=[
            pl.BlockSpec((1, BT, G), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, 1), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 2 * H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 2 * H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, 2 * H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((BT, 2 * H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * 4 * H + 12 * T * B * H,
            bytes_accessed=4 * (T * B * 4 * H + T * B * H + H * 4 * H),
            transcendentals=5 * T * B * H,
        ),
        interpret=interpret,
    )(x_proj, resets3, hc0, wh)
    return outs, hc_final


@jax.custom_vjp
def pallas_lstm_seq(x_proj, hc0, resets, wh):
    """(x_proj [T,B,4H] incl. bi, hc0 [B,2H] f32, resets [T,B] float, wh [H,4H])
    -> (outs [T,B,H] f32, hc_final [B,2H] f32)"""
    return _lstm_seq_pallas_raw(x_proj, hc0, resets, wh)


def _lstm_fwd(x_proj, hc0, resets, wh):
    outs = pallas_lstm_seq(x_proj, hc0, resets, wh)
    return outs, (x_proj, hc0, resets, wh)


def _lstm_bwd(residuals, cotangents):
    x_proj, hc0, resets, wh = residuals
    _, vjp_fn = jax.vjp(lambda xp, hc, w: lstm_seq_reference(xp, hc, resets, w), x_proj, hc0, wh)
    d_x_proj, d_hc0, d_wh = vjp_fn(cotangents)
    return d_x_proj, d_hc0, jnp.zeros_like(resets), d_wh


pallas_lstm_seq.defvjp(_lstm_fwd, _lstm_bwd)
