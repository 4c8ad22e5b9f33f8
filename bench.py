"""Benchmark suite: single-chip PPO throughput on the three flagship regimes.

Prints one JSON line per scenario ({"metric", "value", "unit", "vs_baseline"});
the LAST line is the headline — on-device PPO on the REAL-physics AntEnv vs the
reference's strongest single-accelerator baseline (IsaacGym Ant, PhysX, 4096
env agents, 204,651 FPS on 1 GPU: reference
`sample_factory/benchmarking/benchmarking_isaacgym_ant.txt:1-30`) — and embeds
the full suite under "suite".

Scenarios (each vs its matching reference row, BASELINE.md):
  1. mlp_synthetic   — physics-free env of IsaacGym-Ant obs/action widths:
                       the framework+NN ceiling (sampler+learner overhead only;
                       labeled as such — the physics-bearing comparison is #4)
  2. host_pixel      — 42x42x4 uint8 batched HOST env through the full worker
                       pipeline (shm slabs, uint8 upload, quantized async
                       learner) on the CPU backend: the envpool/ViZDoom
                       feeding-machinery proxy (reference: 50K FPS, 10-core i9)
  3. grid_battle     — 24x24x3 pixel env, IMPALA conv + GRU-256, bf16 compute:
                       the ViZDoom-battle regime (pixels + recurrent PPO;
                       reference: 137,131 FPS on a 36-core Xeon + GPUs,
                       `benchmarking_xeon_36core.txt:31-45`)
  4. ant_physics     — AntEnv: real rigid-body quadruped dynamics
                       (envs/builtin/ant.py), 4096 envs, same widths as #1

Efficiency accounting: every scenario row also carries model-flops fields —
"model_flops_per_env_step" (XLA cost analysis of the unrolled forward x the
rollout/train multiplier), "tflops" (achieved), and "mfu" vs the chip's dense
bf16 peak (device_kind-matched). Host-feeding decomposition rows
(host_pipeline_slab_producer_rate / _device_put_split / _inference_only)
split host_pixel_pipeline_appo into its producer / upload / inference stages
so hardware-bound and framework-bound cost are separable.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

ISAAC_ANT_FPS = 204651.0  # IsaacGym Ant, 1 GPU (lower bound of the published range)
VIZDOOM_XEON_FPS = 137131.0  # ViZDoom battle, 36-core Xeon + GPUs

# per-chip bf16 peak (dense MXU), matched by substring against device_kind;
# order matters (v5p before the v5-lite catch-all)
TPU_PEAK_BF16 = [
    ("v6", 918e12),  # Trillium / v6e
    ("v5p", 459e12),
    ("v5", 197e12),  # v5 lite (v5e)
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
]


def _device_peak_bf16():
    kind = jax.devices()[0].device_kind
    for tag, peak in TPU_PEAK_BF16:
        if tag in kind.lower():
            return peak, kind
    return None, kind


def _fwd_flops_per_sample(model, params, example_obs, rnn_state, batch: int = 1024):
    """Model forward flops per sample, from XLA cost analysis of the UNROLLED
    single-step forward, compiled on the CPU backend (HLO flop counts are
    backend-independent and the compile is free — no tunnel round-trip).
    The scan-based train program itself can't be cost-analyzed: XLA's
    analysis counts while-loop bodies once, not x trip count."""
    try:
        obs_b = {k: jax.ShapeDtypeStruct((batch,) + tuple(v.shape[1:]), v.dtype) for k, v in example_obs.items()}
        rnn_b = jax.ShapeDtypeStruct((batch,) + tuple(rnn_state.shape[1:]), rnn_state.dtype)
        p_spec = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
        compiled = jax.jit(lambda p, o, r: model.apply(p, o, r), backend="cpu").lower(p_spec, obs_b, rnn_b).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca["flops"]) / batch
    except Exception:  # noqa: BLE001 - cost analysis is best-effort
        return None


def _analytic_fwd_flops(model, params, example_obs, rnn_state):
    """Independent cross-check of the XLA cost-analysis flop count: walk the
    param tree and count 2*MACs for every Dense (2-D kernel) and Conv (4-D
    kernel, output spatial dims recovered from capture_intermediates). The
    GRU/LSTM single-step projections are 2-D kernels, so they are covered by
    the Dense rule. Elementwise/normalization flops are deliberately excluded,
    so analytic <= cost-analysis; a large mismatch means one of the two
    counters is wrong (the r4 failure mode this guards against)."""
    from collections.abc import Mapping

    try:
        obs1 = {k: v[:1] for k, v in example_obs.items()}
        rnn1 = rnn_state[:1]
        _, state = model.apply(params, obs1, rnn1, capture_intermediates=True, mutable=["intermediates"])

        out_shapes = {}

        def walk_inter(tree, path=()):
            for k, v in tree.items():
                if k == "__call__":
                    first = v[0]
                    arr = first[0] if isinstance(first, (tuple, list)) else first
                    if hasattr(arr, "shape"):
                        out_shapes[path] = tuple(arr.shape)
                elif isinstance(v, Mapping):
                    walk_inter(v, path + (k,))

        walk_inter(state["intermediates"])

        flops = 0.0

        def walk_params(tree, path=()):
            nonlocal flops
            for k, v in tree.items():
                if isinstance(v, Mapping):
                    walk_params(v, path + (k,))
                elif k == "kernel" and hasattr(v, "ndim"):
                    if v.ndim == 2:
                        flops += 2.0 * v.shape[0] * v.shape[1]
                    elif v.ndim == 4:
                        oshape = out_shapes.get(path)
                        if oshape is None or len(oshape) < 4:
                            raise ValueError(f"no intermediate output for conv at {path}")
                        oh, ow = oshape[-3], oshape[-2]
                        flops += 2.0 * v.shape[0] * v.shape[1] * v.shape[2] * v.shape[3] * oh * ow
                elif k in ("wi", "wh") and hasattr(v, "ndim") and v.ndim == 2:
                    flops += 2.0 * v.shape[0] * v.shape[1]

        walk_params(params["params"] if "params" in params else params)
        return flops
    except Exception:  # noqa: BLE001 - cross-check is best-effort
        return None


def _flops_fields(model, params, example_obs, rnn_state, batch: int = 1024):
    """Cost-analysis flops + analytic cross-check + agreement ratio."""
    ca = _fwd_flops_per_sample(model, params, example_obs, rnn_state, batch=batch)
    analytic = _analytic_fwd_flops(model, params, example_obs, rnn_state)
    fields = {}
    if ca is not None:
        fields["fwd_flops_per_sample"] = round(ca)
    if analytic is not None:
        fields["fwd_flops_analytic"] = round(analytic)
    if ca is not None and analytic is not None and analytic > 0:
        ratio = ca / analytic
        fields["flops_xcheck_ratio"] = round(ratio, 3)
        # cost analysis counts elementwise ops too, so ratio slightly > 1 is
        # expected; outside [0.9, 1.5] one of the counters is untrustworthy
        if not (0.9 <= ratio <= 1.5):
            fields["flops_xcheck_violation"] = True
            print(
                f"WARNING: flop counters disagree (cost_analysis={ca:.3e}, analytic={analytic:.3e})",
                file=sys.stderr,
                flush=True,
            )
    return ca, fields


def _mfu_fields(fwd_flops_per_sample, fps, rollout: int, num_epochs: int):
    """MODEL-flops MFU: rollout inference (1 fwd/step) + T+1 bootstrap value
    pass (1/rollout) + training (fwd + backward ~= 2x fwd, per epoch, every
    sample trains once per epoch). Env dynamics / GAE / optimizer flops are
    excluded (the standard model-flops convention), so this is conservative
    for physics-bearing scenarios. MFU denominator is the chip's dense bf16
    peak; f32 scenarios face a lower realistic ceiling (f32 matmuls run as
    multi-pass bf16 on the MXU), stated in the note.

    mfu >= 1 is physically impossible: when it happens the row is flagged
    (mfu_violation) and a warning goes to stderr — the FPS measurement or the
    flop count is wrong and the row must not be trusted (the r4 artifact
    shipped a 125% MFU row; this guard makes that loud)."""
    if fwd_flops_per_sample is None:
        return {}
    peak, kind = _device_peak_bf16()
    flops_per_env_step = fwd_flops_per_sample * (1.0 + 1.0 / rollout + 3.0 * num_epochs)
    tflops = fps * flops_per_env_step / 1e12
    out = {
        "model_flops_per_env_step": round(flops_per_env_step),
        "tflops": round(tflops, 3),
        "device_kind": kind,
    }
    if peak is not None:
        mfu = tflops * 1e12 / peak
        out["mfu"] = round(mfu, 5)
        out["mfu_peak_tflops_bf16"] = peak / 1e12
        if mfu >= 1.0:
            out["mfu_violation"] = True
            print(
                f"WARNING: impossible MFU {mfu:.3f} (>100% of {peak/1e12:.0f} TFLOP/s bf16 peak) — "
                "FPS measurement or flop count is wrong; do not trust this row",
                file=sys.stderr,
                flush=True,
            )
    return out


def _fetch_barrier(h):
    """Force REAL completion of all work enqueued before `h`.

    jax.block_until_ready is NOT a completion barrier through the tunneled
    TPU plugin: in some tunnel states it returns once the buffer is
    scheduled, so a timing loop that "blocks" on the last handle measures
    DISPATCH throughput — this round it reported the grid_battle program at
    an impossible 109% MFU while an actual value fetch showed a 3000-deep
    execution backlog (and it explains r4's shipped 125%-MFU row). A
    device_get round-trips a real value, which cannot happen before every
    previously enqueued program has executed (single-device FIFO)."""
    import numpy as np

    leaf = jax.tree.leaves(h)[0]
    if getattr(leaf, "size", 1) > 1:
        # fetch ONE element, not the buffer: the slice is a program enqueued
        # after everything else, so its value round-trip proves completion
        leaf = leaf.ravel()[:1]
    np.asarray(jax.device_get(leaf))
    return h


def _measure_fps_windows(step_once, steps_per_iter: int, reps: int = 5, target_window_s: float = 1.5):
    """Steady-state throughput that can NEVER over-report.

    The r4 measurement used block_until_ready, which the tunnel treats as a
    scheduling (not completion) barrier — it reported dispatch rate, up to
    30x the real execution rate (125% MFU in one shipped artifact). Here
    each rep pipelines W iterations and terminates with a REAL value fetch
    (_fetch_barrier): the elapsed time is >= true device time plus any
    tunnel stalls, so every window's FPS is a LOWER bound on the device's
    capability. The reported value is the median window (what this setup
    actually sustains, tunnel included); fps_best is the fastest window —
    the tightest honest lower bound on device capability (relevant for
    fast scenarios where tunnel dispatch phases starve the device: compare
    fps_spread_pct).

    step_once() must dispatch exactly one iteration asynchronously and return
    a handle; the device executes programs in FIFO order, so fetching a value
    of the last iteration proves all previous iterations completed."""
    # pipelined calibration: 10 iterations, one real fetch
    t0 = time.perf_counter()
    h = None
    for _ in range(10):
        h = step_once()
    _fetch_barrier(h)
    per_iter = max((time.perf_counter() - t0) / 10.0, 1e-6)
    W = int(min(1200, max(10, target_window_s / per_iter)))

    fps_reps = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(W):
            h = step_once()
        _fetch_barrier(h)
        elapsed = time.perf_counter() - t0
        fps_reps.append(W * steps_per_iter / elapsed)

    fps_sorted = sorted(fps_reps)
    fps = fps_sorted[len(fps_sorted) // 2]
    spread_pct = 100.0 * (fps_sorted[-1] - fps_sorted[0]) / max(fps, 1e-9)
    return fps, {
        "fps_windows": [round(f, 1) for f in fps_reps],
        "fps_best": round(fps_sorted[-1], 1),
        "fps_spread_pct": round(spread_pct, 2),
        "window_iters": W,
    }


def _run_scenario(cfg, env, num_envs: int, seed: int = 0, trace_dir=None):
    """Compile the fused train iteration for (cfg, env) and measure steady-state
    env-steps/s: median of 5 slope-based windows (see _measure_fps_windows).
    trace_dir: optionally capture a jax.profiler trace of 10 steady-state
    iterations there (evidence for reconciling claimed TFLOP/s against real
    device time)."""
    from sample_factory_tpu.algo.learning import init_train_state, make_train_fn
    from sample_factory_tpu.algo.optimizers import make_optimizer
    from sample_factory_tpu.algo.sampling import init_sampler_state, make_rollout_fn
    from sample_factory_tpu.envs.env_info import extract_env_info
    from sample_factory_tpu.models.actor_critic import create_actor_critic
    from sample_factory_tpu.parallel.mesh import make_mesh, replicate_tree, shard_env_axis

    env_info = extract_env_info(env, cfg)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    tx = make_optimizer(cfg)

    mesh = make_mesh(cfg)
    key = jax.random.PRNGKey(seed)
    k_env, k_model, key = jax.random.split(key, 3)
    ss = init_sampler_state(cfg, env, k_env, num_envs)
    example_obs = {k: v[:2] for k, v in ss.obs.items()}
    ts = init_train_state(cfg, env_info, model, tx, k_model, example_obs)
    ts = replicate_tree(ts, mesh)
    ss = shard_env_axis(ss, mesh)

    rollout_fn = make_rollout_fn(cfg, env, env_info, model)
    train_fn = make_train_fn(cfg, env_info, model, tx, 0)

    fwd_flops, flops_fields = _flops_fields(
        model, ts.params, {k: v[:2] for k, v in ss.obs.items()}, ss.rnn_state[:2], batch=1024
    )

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_iteration(ts, ss, key):
        ss, traj, ep_stats = rollout_fn(ts.params, ts.obs_rms, ss, ts.train_step, 0)
        ts, stats = train_fn(ts, traj, key)
        return ts, ss, stats

    # warmup / compile
    for _ in range(3):
        key, k = jax.random.split(key)
        ts, ss, stats = train_iteration(ts, ss, k)
    _fetch_barrier(stats)

    state = {"ts": ts, "ss": ss, "key": key}

    def step_once():
        state["key"], k = jax.random.split(state["key"])
        state["ts"], state["ss"], stats = train_iteration(state["ts"], state["ss"], k)
        return stats

    fps, window_fields = _measure_fps_windows(step_once, num_envs * cfg.rollout)

    if trace_dir is not None:
        import os

        os.makedirs(trace_dir, exist_ok=True)
        jax.profiler.start_trace(trace_dir)
        h = None
        for _ in range(10):
            h = step_once()
        _fetch_barrier(h)
        jax.profiler.stop_trace()
        window_fields["trace_dir"] = trace_dir

    fields = {**_mfu_fields(fwd_flops, fps, cfg.rollout, cfg.num_epochs), **flops_fields, **window_fields}
    return fps, fields


def bench_mlp_synthetic():
    from sample_factory_tpu.cfg.arguments import default_cfg
    from sample_factory_tpu.envs.builtin.synthetic import SyntheticContinuousEnv
    from sample_factory_tpu.envs.spaces import Box, make_dict_spec

    num_envs = 4096
    cfg = default_cfg(
        env="bench_mlp",
        argv=[
            "--use_rnn=False",
            "--encoder_mlp_layers", "256", "128", "64",
            "--rollout=16",
            "--recurrence=1",
            "--batch_size=32768",
            "--num_epochs=2",
            f"--num_envs={num_envs}",
            "--num_workers=1",
            "--async_rl=False",
            "--normalize_input=True",
            "--normalize_returns=True",
            "--kl_loss_coeff=0.1",
            "--seed=0",
        ],
    )

    class BenchEnv(SyntheticContinuousEnv):
        """IsaacGym-Ant widths (obs 60, act 8), no physics."""

        def __init__(self):
            super().__init__(dim=8, episode_len=1000)
            self.obs_space = make_dict_spec({"obs": Box((60,), 0.0, 1.0)})

        def _obs(self, key):
            return {"obs": jax.random.uniform(key, (60,))}

    fps, mfu = _run_scenario(cfg, BenchEnv(), num_envs)
    return fps, num_envs, mfu


def bench_ant_physics():
    from sample_factory_tpu.cfg.arguments import default_cfg
    from sample_factory_tpu.envs.builtin.ant import AntEnv

    num_envs = 4096
    cfg = default_cfg(
        env="bench_ant",
        argv=[
            "--use_rnn=False",
            "--encoder_mlp_layers", "256", "128", "64",
            "--rollout=16",
            "--recurrence=1",
            "--batch_size=32768",
            "--num_epochs=4",
            f"--num_envs={num_envs}",
            "--num_workers=1",
            "--async_rl=False",
            "--normalize_input=True",
            "--normalize_returns=True",
            "--seed=0",
        ],
    )
    fps, mfu = _run_scenario(cfg, AntEnv(), num_envs)
    return fps, num_envs, mfu


def bench_grid_battle():
    from sample_factory_tpu.cfg.arguments import default_cfg
    from sample_factory_tpu.envs.builtin.grid_battle import GridBattleEnv

    num_envs = 1024
    cfg = default_cfg(
        env="bench_gb",
        argv=[
            "--use_rnn=True",
            "--rnn_type=gru",
            "--rnn_size=256",
            "--encoder_conv_architecture=convnet_impala",
            "--encoder_conv_mlp_layers", "256",
            "--compute_dtype=bfloat16",
            "--rollout=32",
            "--recurrence=32",
            "--batch_size=16384",
            "--num_epochs=1",
            f"--num_envs={num_envs}",
            "--num_workers=1",
            "--async_rl=False",
            "--normalize_input=True",
            "--seed=0",
        ],
    )
    fps, mfu = _run_scenario(cfg, GridBattleEnv(), num_envs, trace_dir="/tmp/sf_bench_trace_grid_battle")
    return fps, num_envs, mfu


class _BenchPixelBatchedEnv:
    """Synthetic batched uint8 pixel env (the envpool/ViZDoom feeding proxy):
    one array call per split, near-zero env cost, so the metric isolates the
    host feeding machinery — worker processes, SharedMemory slabs, uint8
    host->device upload, jitted inference, quantized async training."""

    is_batched_vector_env = True
    gymnasium_api = True

    def __init__(self, num_envs: int, res: int = 42, stack: int = 4):
        import gymnasium as gym
        import numpy as np

        self.num_envs = num_envs
        self.observation_space = gym.spaces.Box(0, 255, (res, res, stack), dtype=np.uint8)
        self.action_space = gym.spaces.Discrete(6)
        self._np = np
        self._obs = np.random.default_rng(0).integers(0, 255, (num_envs, res, res, stack), dtype=np.uint8)
        self.t = np.zeros(num_envs, np.int64)

    def reset(self, seed=None):
        self.t[:] = 0
        return self._obs, {}

    def step(self, actions):
        np = self._np
        self.t += 1
        # cheap content mutation so transfers can't be deduplicated
        self._obs[:, 0, 0, 0] = (self.t % 251).astype(np.uint8)
        done = self.t >= 512
        self.t[done] = 0
        return (
            self._obs,
            np.ones(self.num_envs, np.float32),
            done,
            np.zeros(self.num_envs, bool),
            {},
        )

    def close(self):
        pass


def _make_bench_pixel_env(env_name, cfg=None, env_config=None, render_mode=None):
    n = int(env_config.num_envs) if env_config is not None and getattr(env_config, "num_envs", None) else 1
    return _BenchPixelBatchedEnv(n)


def _register_bench_pixel():
    from sample_factory_tpu.envs.env_utils import register_env

    register_env("bench_host_pixel", _make_bench_pixel_env)


_HOST_PIXEL_BASE_ARGV = [
    "--env=bench_host_pixel",
    "--train_dir=/tmp/sf_tpu_bench",
    "--restart_behavior=overwrite",
    "--worker_num_splits=2",
    "--rollout=32",
    "--num_epochs=1",
    "--async_rl=True",
    "--use_rnn=False",
    "--encoder_conv_architecture=convnet_simple",
    "--encoder_conv_mlp_layers", "128",
    "--normalize_input=True",
    "--train_for_env_steps=999999999",
    "--seed=0",
    "--experiment_summaries_interval=10000",
    "--save_every_sec=10000",
    "--decorrelate_envs_on_one_worker=False",
]


def _host_pixel_measure(extra_argv, n_iters: int = 40, warmup: int = 8):
    """Run the full host pipeline (worker processes + shm slabs + uint8 upload
    + quantized async learner) through HostEnvRunner and measure steady-state
    env-steps/s with 8-iteration sub-windows for the spread."""
    import numpy as np

    from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args
    from sample_factory_tpu.runner.host_runner import HostEnvRunner
    from sample_factory_tpu.runner.runner import AlgoObserver

    argv = _HOST_PIXEL_BASE_ARGV + list(extra_argv)
    parser, _ = parse_sf_args(argv=argv)
    cfg = parse_full_cfg(parser, argv=argv)
    _register_bench_pixel()

    marks = []

    class Timer(AlgoObserver):
        def on_training_iteration(self, runner, stats) -> None:
            marks.append((time.perf_counter(), runner.env_steps))
            if len(marks) >= n_iters:
                runner.stop()

    runner = HostEnvRunner(cfg, register_fn=_register_bench_pixel)
    runner.init()
    runner.register_observer(Timer())
    # flops probe BEFORE run(): the sampler's shm slabs are torn down after
    fwd_flops, flops_fields = _flops_fields(
        runner.model,
        runner.train_state.params,
        {k: np.asarray(v[:2]) for k, v in runner.sampler._split_obs(0).items()},
        np.asarray(runner.sampler.rnn_states[0][:2]),
        batch=256,
    )
    runner.run()
    warm = marks[warmup:]
    fps = (warm[-1][1] - warm[0][1]) / (warm[-1][0] - warm[0][0])
    sub = []
    for i in range(0, len(warm) - 8, 8):
        a, b = warm[i], warm[i + 8]
        sub.append(round((b[1] - a[1]) / max(b[0] - a[0], 1e-9), 1))
    spread = 100.0 * (max(sub) - min(sub)) / max(fps, 1e-9) if sub else None
    return {
        "host_pixel_fps": round(fps, 1),
        "fwd_flops_per_sample": fwd_flops,
        "fps_windows": sub,
        "fps_spread_pct": round(spread, 2) if spread is not None else None,
        **flops_fields,
    }


def _host_pixel_child() -> int:
    """CPU-backend composition (forced via jax.config in main()): everything —
    env workers, inference, learner — on the host's cores."""
    rec = _host_pixel_measure(
        [
            "--experiment=bench_host_pixel",
            "--device=cpu",
            "--num_workers=2",
            "--num_envs_per_worker=32",
            "--batch_size=1024",
        ]
    )
    print(json.dumps(rec), flush=True)
    return 0


def bench_host_pixel_tpu():
    """TPU-backed composition: CPU worker processes feed the tunneled TPU,
    which runs inference and the quantized async learner. Large splits
    amortize the per-step action-fetch round trip (the production host-env
    regime: the reference's equivalent is CPU envs + GPU inference workers).

    On a TUNNELED TPU this pipeline is obs-upload-bandwidth-bound: every env
    step ships 42*42*4 uint8 = 7056 B through the tunnel, so the ceiling is
    bandwidth / 7056. The row carries an inline bandwidth probe +
    upload_bound_ceiling so the measured FPS is checkable against the
    physical limit (a locally-attached TPU pays PCIe bandwidth instead and
    the producer/inference ceilings take over)."""
    import numpy as np

    rec = _host_pixel_measure(
        [
            "--experiment=bench_host_pixel_tpu",
            "--num_workers=2",
            "--num_envs_per_worker=1024",
            "--batch_size=8192",
        ],
        n_iters=16,
        warmup=4,
    )
    # inline upload-bandwidth probe (split-sized transfer, fetch-confirmed)
    dev = jax.devices()[0]
    split = np.random.default_rng(0).integers(0, 255, (1024, 42, 42, 4), np.uint8)
    _fetch_barrier(jax.device_put(split, dev))
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        h = jax.device_put(split, dev)
    _fetch_barrier(h)
    bw = n * split.nbytes / (time.perf_counter() - t0)
    rec["upload_bandwidth_mb_s"] = round(bw / 1e6, 1)
    rec["upload_bound_ceiling_steps_s"] = round(bw / 7056.0, 1)
    return rec


def _producer_child() -> int:
    """Host-feeding decomposition, stage 1: worker->shm-slab PRODUCER rate.

    Same worker-process/slab machinery as the host_pixel scenario, but no
    policy inference and no learner — the host writes constant actions into
    the action slab and drives the step/ready handshake as fast as the env
    workers can fill observation slabs. The gap between this number and
    host_pixel_pipeline_appo is the cost of inference + upload + training."""
    import numpy as np  # noqa: F401

    from sample_factory_tpu.algo.host_sampling import HostVectorSampler
    from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args
    from sample_factory_tpu.envs.env_info import obtain_env_info
    from sample_factory_tpu.models.actor_critic import create_actor_critic

    argv = [
        "--env=bench_host_pixel",
        "--experiment=bench_producer",
        "--train_dir=/tmp/sf_tpu_bench",
        "--restart_behavior=overwrite",
        "--device=cpu",
        "--num_workers=2",
        "--num_envs_per_worker=32",
        "--worker_num_splits=2",
        "--rollout=32",
        "--use_rnn=False",
        "--encoder_conv_architecture=convnet_simple",
        "--seed=0",
        "--decorrelate_envs_on_one_worker=False",
    ]
    parser, _ = parse_sf_args(argv=argv)
    cfg = parse_full_cfg(parser, argv=argv)
    _register_bench_pixel()
    env_info = obtain_env_info(cfg, register_fn=_register_bench_pixel)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    sampler = HostVectorSampler(cfg, env_info, model, register_fn=_register_bench_pixel)
    sampler.start()

    signaled = [False] * sampler.K

    def step_all(n: int) -> None:
        for _t in range(n):
            for s in range(sampler.K):
                if signaled[s]:
                    sampler._wait_ready(s)
                sampler.slabs.arrays["actions"][:, s] = 0
                sampler._signal_step(s)
                signaled[s] = True

    step_all(64)  # warmup (worker env construction already done in start())
    n = 512
    t0 = time.perf_counter()
    step_all(n)
    for s in range(sampler.K):
        sampler._wait_ready(s)
        signaled[s] = False
    elapsed = time.perf_counter() - t0
    fps = n * sampler.num_envs / elapsed
    print(json.dumps({"producer_fps": round(fps, 1)}), flush=True)
    sampler.close()
    return 0


def _run_cpu_child(flag: str, result_key: str, extra_args=()):
    """Spawn a bench scenario on the CPU backend (the tunneled-TPU device RTT
    would swamp what these host-side metrics measure). Returns (value, rec) —
    rec is the child's full JSON record."""
    import os
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " --xla_backend_optimization_level=1").strip()
    out = subprocess.run(
        [sys.executable, __file__, flag, *extra_args],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
    )
    for line in reversed(out.stdout.splitlines()):
        try:
            rec = json.loads(line)
            return float(rec[result_key]), rec
        except Exception:  # noqa: BLE001
            continue
    raise RuntimeError(f"bench child {flag} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def bench_host_pixel():
    return _run_cpu_child("--host-pixel-child", "host_pixel_fps")


def bench_producer() -> float:
    return _run_cpu_child("--producer-child", "producer_fps")[0]


def bench_device_transfer():
    """Host-feeding decomposition, stage 2: host->device obs upload.

    (a) split-sized transfers (64 x 42x42x4 uint8 — exactly what the host
    pipeline ships per inference call): per-call latency dominates on a
    tunneled device, link bandwidth on a locally-attached one;
    (b) bulk 64 MB transfers: the bandwidth ceiling pipelining can reach."""
    import numpy as np

    # block_until_ready is not a completion barrier through the tunnel (see
    # _fetch_barrier): every transfer is confirmed by fetching a byte back
    dev = jax.devices()[0]
    split = np.random.default_rng(0).integers(0, 255, (64, 42, 42, 4), np.uint8)
    for _ in range(3):
        _fetch_barrier(jax.device_put(split, dev))
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        h = jax.device_put(split, dev)
    _fetch_barrier(h)
    split_obs_rate = n * split.shape[0] / (time.perf_counter() - t0)

    big = np.random.default_rng(1).integers(0, 255, (64 << 20,), np.uint8)
    _fetch_barrier(jax.device_put(big, dev))
    m = 3
    t0 = time.perf_counter()
    for _ in range(m):
        h = jax.device_put(big, dev)
    _fetch_barrier(h)
    bulk_gbps = m * big.nbytes / (time.perf_counter() - t0) / 1e9
    return split_obs_rate, bulk_gbps


def bench_pixel_inference_only():
    """Host-feeding decomposition, stage 3: device-resident inference rate for
    the host_pixel model (uint8 obs already on device; upper bound on the
    pipeline's inference stage). Measured at the pipeline's split size (64,
    per-call latency visible) and at batch 4096 (device compute ceiling)."""
    import numpy as np

    from sample_factory_tpu.algo.host_sampling import initial_actor_critic_state
    from sample_factory_tpu.cfg.arguments import default_cfg
    from sample_factory_tpu.envs.env_info import obtain_env_info
    from sample_factory_tpu.models.actor_critic import create_actor_critic

    cfg = default_cfg(
        env="bench_host_pixel",
        argv=[
            "--use_rnn=False",
            "--encoder_conv_architecture=convnet_simple",
            "--encoder_conv_mlp_layers", "128",
            "--normalize_input=True",
            "--seed=0",
        ],
    )
    _register_bench_pixel()
    env_info = obtain_env_info(cfg, register_fn=_register_bench_pixel)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)

    rates = {}
    for batch in (64, 4096):
        obs = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (batch, 42, 42, 4), np.uint8)
        )
        rnn = initial_actor_critic_state(cfg, batch)
        key = jax.random.PRNGKey(0)
        params = model.init(key, {"obs": obs.astype(jnp.float32) / 255.0}, rnn)

        @jax.jit
        def fwd(p, o, r):
            scaled = {"obs": o["obs"].astype(jnp.float32) / 255.0}
            return model.apply(p, scaled, r)

        out = fwd(params, {"obs": obs}, rnn)
        _fetch_barrier(out)
        t0 = time.perf_counter()
        n = 100
        for _ in range(n):
            out = fwd(params, {"obs": obs}, rnn)
        _fetch_barrier(out)  # real completion (device FIFO), not just scheduling
        rates[batch] = n * batch / (time.perf_counter() - t0)
    return rates


def _scaling_child() -> int:
    """One process of the multihost scaling proxy. argv: --scaling-child
    <port> <process_id> <num_processes> <core>. Pinned to ONE core before jax
    initializes so 1-process and 2-process runs get identical per-process
    resources — the ratio then measures COORDINATION cost (globalize
    collectives + lockstep SPMD train step), not core scarcity."""
    import os

    i = sys.argv.index("--scaling-child")
    port, pid, nproc, core = (int(x) for x in sys.argv[i + 1 : i + 5])
    try:
        os.sched_setaffinity(0, {core})
    except (AttributeError, OSError):
        pass
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

    from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args
    from sample_factory_tpu.runner.host_runner import HostEnvRunner
    from sample_factory_tpu.runner.runner import AlgoObserver

    def register():
        import gymnasium as gym
        import numpy as np

        from sample_factory_tpu.envs.env_utils import register_env

        class ComputeEnv(gym.Env):
            """~100 us of real numpy work per step — the env-bound host regime."""

            observation_space = gym.spaces.Box(-10, 10, (32,), np.float32)
            action_space = gym.spaces.Discrete(4)

            def __init__(self):
                self.rng = np.random.default_rng(0)
                self.state = self.rng.normal(size=(64, 32)).astype(np.float32)
                self.t = 0

            def reset(self, seed=None, options=None):
                if seed is not None:
                    self.rng = np.random.default_rng(seed)
                self.t = 0
                return self.state[0], {}

            def step(self, a):
                self.t += 1
                self.state = np.tanh(self.state @ self.state.T[:, :32] * 0.01)
                return self.state[0], float(a), self.t >= 64, False, {}

        register_env("bench_compute_env", lambda name, cfg, env_config, render_mode=None: ComputeEnv())

    # production-shaped iterations (~0.5 s of real work): weak scaling with
    # tiny iterations would only measure the fixed per-iteration lockstep
    # skew of two oversubscribed processes, not the coordination layer
    argv = [
        "--env=bench_compute_env",
        f"--experiment=bench_scaling_p{nproc}",
        "--train_dir=/tmp/sf_tpu_bench",
        "--restart_behavior=overwrite",
        "--device=cpu",
        "--serial_mode=True",
        "--num_workers=2",
        "--num_envs_per_worker=32",
        "--worker_num_splits=2",
        "--rollout=32",
        "--batch_size=1024",
        "--num_epochs=1",
        "--use_rnn=False",
        "--encoder_mlp_layers", "128", "128",
        "--train_for_env_steps=999999999",
        "--async_rl=False",
        "--seed=7",
        "--experiment_summaries_interval=10000",
        "--save_every_sec=10000",
        "--decorrelate_envs_on_one_worker=False",
    ]
    parser, _ = parse_sf_args(argv=argv)
    cfg = parse_full_cfg(parser, argv=argv)
    register()

    marks = []

    class Timer(AlgoObserver):
        def on_training_iteration(self, runner, stats) -> None:
            marks.append((time.perf_counter(), runner.env_steps))
            if len(marks) >= 20:
                runner.stop()

    runner = HostEnvRunner(cfg, register_fn=register)
    runner.init()
    runner.register_observer(Timer())
    runner.run()
    warm = marks[6:]
    fps = (warm[-1][1] - warm[0][1]) / (warm[-1][0] - warm[0][0])  # env_steps is GLOBAL
    print(json.dumps({"scaling_fps": round(fps, 1), "pid": pid, "nproc": nproc}), flush=True)
    if nproc > 1:
        jax.distributed.shutdown()
    return 0


def bench_scaling_proxy():
    """Multihost weak-scaling proxy on this box (BASELINE.md north star:
    >= 80% scaling efficiency; real multi-chip/multi-host hardware is not
    available, so this is the honest stand-in): the 2-process jax.distributed
    host-env pipeline (per-host samplers -> one global SPMD train step via
    globalize_host_trajectory) vs a single process, each process pinned to
    one core. Ideal weak scaling doubles global throughput."""
    import os
    import socket
    import subprocess

    def run(nproc):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2 --xla_backend_optimization_level=1"
        procs = [
            subprocess.Popen(
                [sys.executable, __file__, "--scaling-child", str(port), str(i), str(nproc), str(i)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
            )
            for i in range(nproc)
        ]
        outs = [p.communicate(timeout=900)[0] for p in procs]
        fps = None
        for out, p in zip(outs, procs):
            if p.returncode != 0:
                raise RuntimeError(f"scaling child failed:\n{out[-2000:]}")
            for line in reversed(out.splitlines()):
                try:
                    rec = json.loads(line)
                    if rec.get("pid") == 0:
                        fps = rec["scaling_fps"]
                except Exception:  # noqa: BLE001
                    continue
        if fps is None:
            raise RuntimeError(f"no scaling result:\n{outs[0][-2000:]}")
        return fps

    fps1 = run(1)
    fps2 = run(2)
    return fps1, fps2, fps2 / (2.0 * fps1)


def _try_scenario(suite, fn):
    """Run one non-headline scenario; on failure emit an error row instead of
    killing the whole suite (the headline must always print for the driver)."""
    try:
        fn(suite)
    except Exception as e:  # noqa: BLE001
        import traceback

        row = {"metric": f"{getattr(fn, '__name__', 'scenario')}", "error": f"{type(e).__name__}: {e}"}
        traceback.print_exc(file=sys.stderr)
        suite.append(row)
        print(json.dumps(row), flush=True)


def main() -> int:
    if "--scaling-child" in sys.argv:
        return _scaling_child()
    if "--host-pixel-child" in sys.argv or "--producer-child" in sys.argv:
        # Force the CPU backend via jax.config, not the env var: site
        # customization may register an accelerator plugin that overrides
        # JAX_PLATFORMS at interpreter start, and these children measure
        # HOST-side machinery (worker procs, slabs, local inference).
        jax.config.update("jax_platforms", "cpu")
        assert jax.devices()[0].platform == "cpu", "bench child must run on the CPU backend"
    if "--host-pixel-child" in sys.argv:
        return _host_pixel_child()
    if "--producer-child" in sys.argv:
        return _producer_child()

    suite = []

    def s_mlp(suite):
        fps, n, mfu = bench_mlp_synthetic()
        suite.append(
            {
                "metric": "mlp_synthetic_sync_ppo_framework_ceiling",
                "value": round(fps, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(fps / ISAAC_ANT_FPS, 3),
                **mfu,
                "note": f"{n} physics-FREE envs, IsaacGym-Ant widths; framework+NN overhead ceiling, "
                "not a physics comparison (that is ant_physics_sync_ppo); f32 model — realistic MXU "
                "ceiling is below the quoted bf16 peak",
            }
        )
        print(json.dumps(suite[-1]), flush=True)

    def s_host_pixel(suite):
        fps, rec = bench_host_pixel()
        host_mfu = _mfu_fields(rec.get("fwd_flops_per_sample"), fps, rollout=32, num_epochs=1)
        extra = {k: rec[k] for k in ("fps_windows", "fps_spread_pct", "fwd_flops_analytic", "flops_xcheck_ratio") if rec.get(k) is not None}
        suite.append(
            {
                "metric": "host_pixel_pipeline_appo",
                "value": round(fps, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(fps / 50000.0, 3),
                **host_mfu,
                **extra,
                "note": "42x42x4 uint8 synthetic batched host env (envpool-style, zero env cost), "
                "2 worker procs on a 2-CPU box, quantized async learner on the CPU backend; "
                "vs ViZDoom battle 50K FPS on a 10-core i9 (feeding-machinery proxy — this "
                "box has 5x fewer cores, no accelerator for inference, and no real game engine); "
                "see host_pipeline_* decomposition rows for where the ceiling is",
            }
        )
        print(json.dumps(suite[-1]), flush=True)

    def s_producer(suite):
        producer_fps = bench_producer()
        suite.append(
            {
                "metric": "host_pipeline_slab_producer_rate",
                "value": round(producer_fps, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(producer_fps / 50000.0, 3),
                "note": "stage 1 of host_pixel_pipeline_appo: worker procs filling shm obs slabs with "
                "constant actions, NO inference/upload/training — the pure producer ceiling on this box",
            }
        )
        print(json.dumps(suite[-1]), flush=True)

    def s_transfer(suite):
        split_obs_rate, bulk_gbps = bench_device_transfer()
        suite.append(
            {
                "metric": "host_pipeline_device_put_split",
                "value": round(split_obs_rate, 1),
                "unit": "obs/s",
                "vs_baseline": round(split_obs_rate / 50000.0, 3),
                "bulk_bandwidth_gbps": round(bulk_gbps, 3),
                "note": "stage 2: host->device upload of split-sized uint8 obs batches (64x42x42x4, "
                "per-call latency visible — on the tunneled TPU this is RTT-bound); "
                "bulk_bandwidth_gbps = 64MB transfers, the ceiling pipelining can reach",
            }
        )
        print(json.dumps(suite[-1]), flush=True)

    def s_inference(suite):
        inf_rates = bench_pixel_inference_only()
        suite.append(
            {
                "metric": "host_pipeline_inference_only",
                "value": round(inf_rates[4096], 1),
                "unit": "obs/s",
                "vs_baseline": round(inf_rates[4096] / 50000.0, 3),
                "split_size_rate": round(inf_rates[64], 1),
                "note": "stage 3: device-resident conv inference for the host-pixel model at batch "
                "4096 (device ceiling) and at the pipeline's split size 64 (split_size_rate, "
                "dispatch-latency-bound through the tunnel)",
            }
        )
        print(json.dumps(suite[-1]), flush=True)

    def s_scaling(suite):
        fps1, fps2, eff = bench_scaling_proxy()
        suite.append(
            {
                "metric": "multihost_scaling_proxy_2proc",
                "value": round(eff, 4),
                "unit": "weak_scaling_efficiency",
                "vs_baseline": round(eff / 0.80, 3),
                "fps_1proc": fps1,
                "fps_2proc_global": fps2,
                "note": "2-process jax.distributed host-env pipeline vs 1 process, each pinned to one "
                "core (identical per-process resources): ratio of global throughput to 2x the "
                "single-process run = weak-scaling efficiency of the coordination layer (globalize "
                "collectives + lockstep SPMD train step) — the honest stand-in for BASELINE's >=80% "
                "multi-host target on a box with no second accelerator; losses = gloo all-gathers "
                "crossing process boundaries on CPU + the lockstep barrier",
            }
        )
        print(json.dumps(suite[-1]), flush=True)

    def s_host_pixel_tpu(suite):
        if jax.default_backend() == "cpu":
            suite.append({"metric": "host_pixel_pipeline_appo_tpu", "skipped": "no TPU backend"})
            print(json.dumps(suite[-1]), flush=True)
            return
        rec = bench_host_pixel_tpu()
        fps = rec["host_pixel_fps"]
        host_mfu = _mfu_fields(rec.get("fwd_flops_per_sample"), fps, rollout=32, num_epochs=1)
        extra = {
            k: rec[k]
            for k in (
                "fps_windows",
                "fps_spread_pct",
                "fwd_flops_analytic",
                "flops_xcheck_ratio",
                "upload_bandwidth_mb_s",
                "upload_bound_ceiling_steps_s",
            )
            if rec.get(k) is not None
        }
        suite.append(
            {
                "metric": "host_pixel_pipeline_appo_tpu",
                "value": fps,
                "unit": "env_steps/s",
                "vs_baseline": round(fps / 50000.0, 3),
                **host_mfu,
                **extra,
                "note": "TPU-backed host pipeline: 2 CPU worker procs x 1024 envs feed the tunneled "
                "TPU (uint8 upload per split, inference + quantized async learner on device). "
                "Through the tunnel this is obs-upload-BANDWIDTH-bound: compare value against "
                "upload_bound_ceiling_steps_s (= measured tunnel MB/s / 7056 B per obs). A "
                "locally-attached TPU pays PCIe bandwidth (GB/s) instead, where the producer "
                "and device-inference ceilings (see host_pipeline_* rows) take over. vs ViZDoom "
                "battle 50K FPS on a 10-core i9",
            }
        )
        print(json.dumps(suite[-1]), flush=True)

    def s_grid_battle(suite):
        fps, n, mfu = bench_grid_battle()
        suite.append(
            {
                "metric": "grid_battle_pixel_rnn_ppo",
                "value": round(fps, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(fps / VIZDOOM_XEON_FPS, 3),
                **mfu,
                "note": f"{n} on-device 24x24x3 pixel envs, IMPALA conv + GRU-256, bf16, XLA fused-scan "
                "RNN (beats the optional Pallas kernel, docs/performance.md); vs ViZDoom battle "
                "137,131 FPS (36-core Xeon + GPUs); device time cross-checked against the jax.profiler "
                "trace in trace_dir",
            }
        )
        print(json.dumps(suite[-1]), flush=True)

    for fn in (s_mlp, s_host_pixel, s_producer, s_transfer, s_inference, s_scaling, s_host_pixel_tpu, s_grid_battle):
        _try_scenario(suite, fn)

    try:
        fps, n, mfu = bench_ant_physics()
        headline = {
            "metric": "ant_physics_sync_ppo",
            "value": round(fps, 1),
            "unit": "env_steps/s",
            "vs_baseline": round(fps / ISAAC_ANT_FPS, 3),
            **mfu,
            "note": f"{n} on-device rigid-body ant envs (real dynamics, envs/builtin/ant.py) "
            "vs IsaacGym Ant PhysX 204,651 FPS (1 GPU); MFU counts MODEL flops only — "
            "physics flops excluded, so the chip is busier than the mfu field suggests",
            "suite": suite + [None],  # placeholder replaced below
        }
        headline["suite"][-1] = {k: headline[k] for k in ("metric", "value", "unit", "vs_baseline") if k in headline}
    except Exception as e:  # noqa: BLE001 - headline must still print for the driver
        import traceback

        traceback.print_exc(file=sys.stderr)
        headline = {"metric": "ant_physics_sync_ppo", "error": f"{type(e).__name__}: {e}", "suite": suite}
    print(json.dumps(headline), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
