"""Training entry point.

Parity: reference `sample_factory/train.py` — `run_rl(cfg)` (:31) with
resume-merge of the saved config (`make_runner`, :12-26).
"""

from __future__ import annotations

import os

from sample_factory_tpu.cfg.arguments import maybe_load_from_checkpoint, verify_cfg
from sample_factory_tpu.runner.runner import Runner, make_runner
from sample_factory_tpu.utils.utils import cfg_file, configure_jax_platform, log


def make_rl_runner(cfg, register_fn=None):
    """Resolve config + build (but do not init) the right runner for cfg.

    Returns (cfg, runner). Use this instead of run_rl to register custom
    AlgoObservers / episodic-stats handlers before training starts (the
    reference exposes the same seam as train.py make_runner, used by
    sf_examples/dmlab/train_dmlab.py:79-95)."""
    if cfg.restart_behavior == "resume" and os.path.isfile(cfg_file(cfg)):
        cfg = maybe_load_from_checkpoint(cfg)
    # platform selection AFTER resume-merge: a restored --device must win over
    # the environment default (resume-merge itself never touches jax)
    configure_jax_platform(cfg)
    if cfg.restart_behavior == "restart" and os.path.isfile(cfg_file(cfg)):
        raise RuntimeError(
            f"Experiment {cfg.experiment} already exists and --restart_behavior=restart; "
            "use resume or overwrite"
        )
    if cfg.jax_distributed:
        import jax

        jax.distributed.initialize()

    from sample_factory_tpu.envs.env_info import obtain_env_info

    env_info = obtain_env_info(cfg, register_fn=register_fn)
    if not env_info.is_device_env and env_info.num_agents > 1:
        # num_envs counts agent-slots (transitions per step), like the
        # reference's total_num_agents (rl_utils.py:28-33)
        cfg.num_envs = cfg.num_workers * cfg.num_envs_per_worker * env_info.num_agents
    verify_cfg(cfg)
    if env_info.is_device_env:
        if cfg.num_policies > 1 or env_info.num_agents > 1:
            # multi-agent device envs always go through the population runner:
            # its mixed-mode sampler handles agent slots + per-slot policies
            # (P=1 = single-policy self-play)
            from sample_factory_tpu.runner.multi_policy_runner import MultiPolicyRunner

            runner = MultiPolicyRunner(cfg)
        else:
            runner = Runner(cfg)
    elif cfg.num_policies > 1:
        from sample_factory_tpu.runner.host_multi_policy_runner import HostMultiPolicyRunner

        runner = HostMultiPolicyRunner(cfg, register_fn=register_fn)
    else:
        from sample_factory_tpu.runner.host_runner import HostEnvRunner

        runner = HostEnvRunner(cfg, register_fn=register_fn)
    return cfg, runner


def run_rl(cfg, register_fn=None) -> int:
    _, runner = make_rl_runner(cfg, register_fn=register_fn)
    runner.init()
    status = runner.run()
    return status
