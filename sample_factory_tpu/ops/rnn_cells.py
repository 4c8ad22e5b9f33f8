"""TPU-optimized GRU/LSTM cells with fused sequence execution.

The learner's BPTT (`algo/learning.py` forward_seq) processes [S, R] segments
of head outputs through the recurrent core. A naive per-step scan performs two
small matmuls per step; the TPU-native formulation hoists the input projection
of ALL timesteps into one large MXU matmul ([T*B, D] x [D, G*H]) and leaves
only the recurrent half ([B, H] x [H, G*H] + gates) inside the scan — the
classic fused-RNN decomposition (as in cuDNN/Haste), expressed so XLA keeps
the recurrent weights resident in VMEM across scan iterations.

Each cell is one flax module whose `__call__` serves both modes (params are
shared):
  cell(x, h)                            — single step (rollout/inference)
  cell(x_seq, h0, resets=r, seq=True)   — fused scan with masked state resets

Gate math follows the standard published formulations (GRU: Cho et al. 2014
with the cuDNN reset-gate placement; LSTM: no peepholes, forget bias 1.0).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sample_factory_tpu.models.model_utils import kernel_initializer


class FusedGRUCell(nn.Module):
    """GRU with gate layout [r, z, n]."""

    features: int
    cfg: Any = None
    dtype: Any = jnp.float32

    def _mk_params(self, in_features: int):
        H = self.features
        init = kernel_initializer(self.cfg) if self.cfg is not None else nn.initializers.lecun_normal()
        wi = self.param("wi", init, (in_features, 3 * H))
        wh = self.param("wh", nn.initializers.orthogonal(), (H, 3 * H))
        bi = self.param("bi", nn.initializers.zeros, (3 * H,))
        bh = self.param("bh", nn.initializers.zeros, (3 * H,))
        return wi, wh, bi, bh

    def _gates(self, x_proj, h_proj, h):
        xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
        hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h

    @nn.compact
    def __call__(self, x, h, resets: Optional[jnp.ndarray] = None, seq: bool = False):
        dtype = self.dtype
        wi, wh, bi, bh = self._mk_params(x.shape[-1])
        wi, wh, bi, bh = wi.astype(dtype), wh.astype(dtype), bi.astype(dtype), bh.astype(dtype)

        if not seq:
            x_proj = x.astype(dtype) @ wi + bi
            h_proj = h.astype(dtype) @ wh + bh
            new_h = self._gates(x_proj, h_proj, h.astype(dtype)).astype(jnp.float32)
            return new_h, new_h

        # fused sequence: x [T, B, D], h [B, H], resets [T, B]
        x_proj_seq = x.astype(dtype) @ wi + bi  # one large MXU matmul

        from sample_factory_tpu.ops.pallas_gru import pallas_gru_seq, pallas_gru_supported

        want_pallas = self.cfg is not None and bool(getattr(self.cfg, "pallas_rnn", False))
        if want_pallas and pallas_gru_supported(x.shape[0], x.shape[1], self.features, dtype):
            # Pallas kernel: recurrent weights + hidden state stay VMEM-resident
            # for the whole sequence; backward rematerializes via the scan below
            return pallas_gru_seq(x_proj_seq, h, resets.astype(jnp.float32), wh, bh)

        def step(carry, inp):
            x_proj, reset = inp
            h_proj = carry.astype(dtype) @ wh + bh
            new_h = self._gates(x_proj, h_proj, carry.astype(dtype)).astype(jnp.float32)
            carried = jnp.where(reset[:, None] > 0, jnp.zeros_like(new_h), new_h)
            return carried, new_h

        h_final, outs = jax.lax.scan(step, h, (x_proj_seq, resets))
        return outs, h_final


class FusedLSTMCell(nn.Module):
    """LSTM with gate layout [i, f, g, o], forget bias 1.0. State = concat[h, c]."""

    features: int
    cfg: Any = None
    dtype: Any = jnp.float32

    def _mk_params(self, in_features: int):
        H = self.features
        init = kernel_initializer(self.cfg) if self.cfg is not None else nn.initializers.lecun_normal()
        wi = self.param("wi", init, (in_features, 4 * H))
        wh = self.param("wh", nn.initializers.orthogonal(), (H, 4 * H))
        bi = self.param("bi", nn.initializers.zeros, (4 * H,))
        return wi, wh, bi

    def _gates(self, proj, c):
        i, f, g, o = jnp.split(proj, 4, axis=-1)
        new_c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        return new_h, new_c

    @nn.compact
    def __call__(self, x, hc, resets: Optional[jnp.ndarray] = None, seq: bool = False):
        H = self.features
        dtype = self.dtype
        wi, wh, bi = self._mk_params(x.shape[-1])
        wi, wh, bi = wi.astype(dtype), wh.astype(dtype), bi.astype(dtype)

        if not seq:
            h, c = hc[:, :H], hc[:, H:]
            proj = x.astype(dtype) @ wi + h.astype(dtype) @ wh + bi
            new_h, new_c = self._gates(proj, c.astype(dtype))
            new_h, new_c = new_h.astype(jnp.float32), new_c.astype(jnp.float32)
            return new_h, jnp.concatenate([new_h, new_c], axis=-1)

        x_proj_seq = x.astype(dtype) @ wi + bi

        from sample_factory_tpu.ops.pallas_gru import pallas_gru_supported, pallas_lstm_seq

        want_pallas = self.cfg is not None and bool(getattr(self.cfg, "pallas_rnn", False))
        if want_pallas and pallas_gru_supported(x.shape[0], x.shape[1], H, dtype):
            return pallas_lstm_seq(x_proj_seq, hc, resets.astype(jnp.float32), wh)

        def step(carry, inp):
            x_proj, reset = inp
            h, c = carry[:, :H], carry[:, H:]
            proj = x_proj + h.astype(dtype) @ wh
            new_h, new_c = self._gates(proj, c.astype(dtype))
            new_hc = jnp.concatenate([new_h, new_c], axis=-1).astype(jnp.float32)
            carried = jnp.where(reset[:, None] > 0, jnp.zeros_like(new_hc), new_hc)
            return carried, new_h.astype(jnp.float32)

        hc_final, outs = jax.lax.scan(step, hc, (x_proj_seq, resets))
        return outs, hc_final
