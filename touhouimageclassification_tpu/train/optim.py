"""Optimizers and LR schedules from :class:`OptimizerConfig`.

Covers every reference configuration:
- AdamW (ViT paths: ``ntrain.py:39-41``, ``finetune.py:314``),
- SGD (+momentum hook) with StepLR(step_size=5 epochs, gamma=0.25)
  (``TIC/ResNet/train.py:240-241``),
- per-step linear warmup (500 steps) then linear decay
  (``transformers.get_linear_schedule_with_warmup``, ``finetune.py:318-328``),
- gradient accumulation via ``optax.MultiSteps``
  (``accumulate_grad_batches=4``, ``TIC/ResMoE/parameter.py:17``),
- the NaN guard as ``optax.apply_if_finite`` — instead of patching the loss
  with a running average (``finetune.py:181-188``), non-finite updates are
  skipped entirely, which is the correct fix for the same failure.
"""
from __future__ import annotations

import optax

from ..config import OptimizerConfig


def build_schedule(cfg: OptimizerConfig, steps_per_epoch: int = 1):
    if cfg.schedule == "constant":
        return cfg.learning_rate
    if cfg.schedule == "warmup_linear":
        total = max(cfg.total_steps, cfg.warmup_steps + 1)
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
                optax.linear_schedule(
                    cfg.learning_rate, 0.0, total - cfg.warmup_steps
                ),
            ],
            [cfg.warmup_steps],
        )
    if cfg.schedule == "step":
        def sched(step):
            epoch = step // max(steps_per_epoch, 1)
            return cfg.learning_rate * cfg.step_lr_gamma ** (
                epoch // cfg.step_lr_epoch_size
            )
        return sched
    raise ValueError(f"Unknown schedule: {cfg.schedule}")


def build_optimizer(
    cfg: OptimizerConfig, steps_per_epoch: int = 1, nan_guard: bool = True
) -> optax.GradientTransformation:
    schedule = build_schedule(cfg, steps_per_epoch)
    if cfg.name == "adamw":
        tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    elif cfg.name == "sgd":
        tx = optax.sgd(schedule, momentum=cfg.momentum or None)
    else:
        raise ValueError(f"Unknown optimizer: {cfg.name}")
    if cfg.max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    if nan_guard:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx
