"""bench.py flop-accounting guards (VERDICT r4: the shipped artifact claimed
an impossible 125% MFU — the accounting machinery itself must be testable).

The XLA cost-analysis flop count (used for the MFU fields) is cross-checked
against an independent analytic count (2*MACs walked from the param tree with
conv output dims recovered via capture_intermediates). The two counters are
built differently; agreement within [0.9, 1.5] (cost analysis also counts
elementwise ops) validates both."""

import numpy as np
import pytest

import jax

import bench
from sample_factory_tpu.cfg.arguments import default_cfg
from sample_factory_tpu.models.actor_critic import create_actor_critic, initial_actor_critic_state


def _model_flops(argv, env):
    from sample_factory_tpu.envs.env_info import extract_env_info

    cfg = default_cfg(env="t", argv=argv)
    env_info = extract_env_info(env, cfg)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    key = jax.random.PRNGKey(0)
    obs_shape = env.obs_space["obs"].shape
    obs = {"obs": jax.numpy.zeros((2,) + tuple(obs_shape), jax.numpy.float32)}
    rnn = initial_actor_critic_state(cfg, 2)
    params = model.init(key, obs, rnn)
    ca = bench._fwd_flops_per_sample(model, params, obs, rnn, batch=256)
    analytic = bench._analytic_fwd_flops(model, params, obs, rnn)
    return ca, analytic


def test_flops_xcheck_mlp():
    from sample_factory_tpu.envs.builtin.synthetic import SyntheticVectorDiscreteEnv

    ca, analytic = _model_flops(
        ["--use_rnn=False", "--encoder_mlp_layers", "256", "128", "64", "--seed=0"],
        SyntheticVectorDiscreteEnv(num_actions=4, episode_len=8, dim=60),
    )
    assert ca is not None and analytic is not None
    assert 0.9 <= ca / analytic <= 1.5, f"cost_analysis={ca:.3e} analytic={analytic:.3e}"


def test_flops_xcheck_conv_gru():
    """The grid_battle architecture shape: IMPALA conv + GRU core on 24x24 pixels."""
    from sample_factory_tpu.envs.builtin.synthetic import SyntheticDiscreteEnv

    ca, analytic = _model_flops(
        [
            "--use_rnn=True", "--rnn_type=gru", "--rnn_size=256",
            "--encoder_conv_architecture=convnet_impala",
            "--encoder_conv_mlp_layers", "256", "--seed=0",
        ],
        SyntheticDiscreteEnv(num_actions=4, episode_len=8, res=24),
    )
    assert ca is not None and analytic is not None
    assert 0.9 <= ca / analytic <= 1.5, f"cost_analysis={ca:.3e} analytic={analytic:.3e}"


def test_mfu_violation_flagged():
    """A physically impossible FPS must flag the row, not ship silently."""
    fields = bench._mfu_fields(1e6, fps=1e12, rollout=16, num_epochs=1)
    if "mfu" in fields:  # device peak known (TPU); on CPU _device_peak_bf16 is None
        assert fields.get("mfu_violation") is True


def test_measure_fps_windows_reports_spread():
    """Slope-based windows: fixed per-call overhead must cancel out."""
    state = {"x": jax.numpy.zeros((8,))}

    @jax.jit
    def step(x):
        return x + 1

    def step_once():
        state["x"] = step(state["x"])
        return state["x"]

    fps, fields = bench._measure_fps_windows(step_once, steps_per_iter=100, reps=3, target_window_s=0.05)
    assert fps > 0
    assert len(fields["fps_windows"]) == 3
    assert fields["fps_spread_pct"] >= 0
