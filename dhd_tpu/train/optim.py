"""Optimizer + LR schedule matching the reference training recipe.

AdamW lr 2e-4, wd 1e-2, L2 grad clip at 5, linear warmup 200 iters from
ratio 0.001, step decay at epoch boundaries (DHD-S.py:261-270).
"""
from __future__ import annotations

from typing import Optional

import optax

from dhd_tpu.config import OptimConfig


def make_lr_schedule(cfg: OptimConfig, steps_per_epoch: int):
    """mmcv 'step' policy with linear warmup."""
    def schedule(step):
        import jax.numpy as jnp
        warm = cfg.warmup_ratio + (1.0 - cfg.warmup_ratio) * jnp.minimum(
            step / max(cfg.warmup_iters, 1), 1.0)
        epoch = step // max(steps_per_epoch, 1)
        decay = 1.0
        for e in cfg.step_epochs:
            decay = decay * jnp.where(epoch >= e, cfg.step_gamma, 1.0)
        return cfg.lr * warm * decay
    return schedule


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int = 1
                   ) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(
            learning_rate=make_lr_schedule(cfg, steps_per_epoch),
            b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=cfg.weight_decay,
        ),
    )
