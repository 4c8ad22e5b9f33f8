"""Fused RNN cells: step-scan vs fused-sequence equivalence (the invariant the
reference guards with its PackedSequence-vs-naive-loop test, tests/algo/test_rnn.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sample_factory_tpu.ops.rnn_cells import FusedGRUCell, FusedLSTMCell


@pytest.mark.parametrize("cell_cls,state_mult", [(FusedGRUCell, 1), (FusedLSTMCell, 2)])
def test_sequence_matches_step_scan(cell_cls, state_mult):
    H, D, T, B = 16, 12, 9, 4
    cell = cell_cls(H)
    key = jax.random.PRNGKey(0)
    x_seq = jax.random.normal(key, (T, B, D))
    h0 = jax.random.normal(jax.random.fold_in(key, 1), (B, H * state_mult))
    resets = (jax.random.uniform(jax.random.fold_in(key, 2), (T, B)) < 0.25).astype(jnp.float32)

    params = cell.init(jax.random.PRNGKey(3), x_seq[0], h0)

    # reference: python loop over step mode with the same reset semantics
    h = h0
    outs_ref = []
    for t in range(T):
        out, h_new = cell.apply(params, x_seq[t], h)
        outs_ref.append(out)
        h = jnp.where(resets[t][:, None] > 0, jnp.zeros_like(h_new), h_new)
    outs_ref = jnp.stack(outs_ref)

    outs_seq, h_final = cell.apply(params, x_seq, h0, resets=resets, seq=True)
    np.testing.assert_allclose(np.asarray(outs_seq), np.asarray(outs_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_final), np.asarray(h), rtol=1e-5, atol=1e-5)


def test_gradients_flow_and_stop_at_resets():
    """BPTT must not backprop through reset boundaries."""
    H, D, T, B = 8, 8, 6, 2
    cell = FusedGRUCell(H)
    key = jax.random.PRNGKey(0)
    x_seq = jax.random.normal(key, (T, B, D))
    h0 = jnp.zeros((B, H))
    params = cell.init(jax.random.PRNGKey(1), x_seq[0], h0)

    resets = jnp.zeros((T, B))
    resets = resets.at[3, :].set(1.0)  # boundary after step 3

    def loss_on_last(x):
        outs, _ = cell.apply(params, x, h0, resets=resets, seq=True)
        return jnp.sum(outs[-1])

    g = jax.grad(loss_on_last)(x_seq)
    # gradient w.r.t. inputs before the reset boundary must be exactly zero
    assert float(jnp.abs(g[:3]).max()) == 0.0
    assert float(jnp.abs(g[4:]).max()) > 0.0


def test_core_seq_matches_core_steps():
    """ActorCritic.forward_core_seq == scanning forward_core (2-layer LSTM)."""
    from sample_factory_tpu.cfg.arguments import default_cfg
    from sample_factory_tpu.envs.spaces import Box, Discrete, make_dict_spec
    from sample_factory_tpu.models.actor_critic import create_actor_critic, initial_actor_critic_state

    cfg = default_cfg(
        env="t",
        argv=["--seed=1", "--use_rnn=True", "--rnn_type=lstm", "--rnn_size=12", "--rnn_num_layers=2",
              "--encoder_mlp_layers", "16"],
    )
    obs_space = make_dict_spec({"obs": Box((5,))})
    model = create_actor_critic(cfg, obs_space, Discrete(3))
    B, T = 3, 5
    obs = {"obs": jnp.ones((B, 5))}
    rnn = initial_actor_critic_state(cfg, B)
    params = model.init(jax.random.PRNGKey(0), obs, rnn)

    key = jax.random.PRNGKey(7)
    head_seq = jax.random.normal(key, (T, B, 16))
    resets = (jax.random.uniform(jax.random.fold_in(key, 1), (T, B)) < 0.3).astype(jnp.float32)

    h = rnn
    outs_ref = []
    for t in range(T):
        out, h_new = model.apply(params, head_seq[t], h, method="forward_core")
        outs_ref.append(out)
        h = jnp.where(resets[t][:, None] > 0, jnp.zeros_like(h_new), h_new)
    outs_ref = jnp.stack(outs_ref)

    outs_seq, _ = model.apply(params, head_seq, rnn, resets, method="forward_core_seq")
    np.testing.assert_allclose(np.asarray(outs_seq), np.asarray(outs_ref), rtol=1e-5, atol=1e-5)
