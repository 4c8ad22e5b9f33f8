"""Weights & Biases integration (gated on availability).

Parity: reference `sample_factory/utils/wandb_utils.py:6-66` (init_wandb with
sync_tensorboard, resume by run id, finish_wandb).
"""

from __future__ import annotations

from sample_factory_tpu.utils.utils import experiment_dir, log


def wandb_available() -> bool:
    try:
        import wandb  # noqa: F401

        return True
    except ImportError:
        return False


def init_wandb(cfg) -> None:
    if not cfg.with_wandb:
        return
    if not wandb_available():
        log.warning("--with_wandb=True but wandb is not installed; skipping")
        return

    import wandb

    wandb_id = f"{cfg.experiment}_{abs(hash(experiment_dir(cfg))) % 10**8}"
    wandb.init(
        dir=cfg.wandb_dir or experiment_dir(cfg),
        project=cfg.wandb_project,
        entity=cfg.wandb_user,
        sync_tensorboard=True,
        id=wandb_id,
        name=cfg.experiment,
        group=cfg.wandb_group,
        job_type=cfg.wandb_job_type,
        tags=list(cfg.wandb_tags or []),
        resume="allow",
        settings=wandb.Settings(start_method="fork"),
    )
    wandb.config.update(dict(cfg), allow_val_change=True)


def finish_wandb(cfg) -> None:
    if cfg.with_wandb and wandb_available():
        import wandb

        wandb.run.finish()
