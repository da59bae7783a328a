"""Optimizers and LR schedules from :class:`OptimizerConfig`.

Covers every reference configuration:
- AdamW (ViT paths: ``ntrain.py:39-41``, ``finetune.py:314``),
- SGD (+momentum hook) with StepLR(step_size=5 epochs, gamma=0.25)
  (``TIC/ResNet/train.py:240-241``),
- per-step linear warmup (500 steps) then linear decay
  (``transformers.get_linear_schedule_with_warmup``, ``finetune.py:318-328``),
- gradient accumulation via ``optax.MultiSteps``
  (``accumulate_grad_batches=4``, ``TIC/ResMoE/parameter.py:17``).

The NaN guard lives in the trainer, not here: ``optax.apply_if_finite``
checks every leaf with a separate reduction (profiled at 87 ms/step for
ViT-L — 270 tiny kernels), so the trainer instead takes one fused
finiteness/norm pass over the flattened gradients and skips the update via
``lax.cond`` (the correct fix for the reference's loss-patching workaround,
``finetune.py:181-188``).
"""
from __future__ import annotations

import optax

from ..config import OptimizerConfig


def build_schedule(cfg: OptimizerConfig, steps_per_epoch: int = 1):
    # always a callable: a float LR makes optax emit a stateless scaler while
    # schedules carry a count, so mixing them changes the opt_state pytree
    # and breaks checkpoint restore across schedule settings
    if cfg.schedule == "constant":
        return optax.constant_schedule(cfg.learning_rate)
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
    """``nan_guard`` is accepted for API stability but handled by the
    trainer's fused single-pass guard (see module docstring)."""
    del nan_guard
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
    return tx


def fast_global_norm(tree, impl: str | None = None) -> "optax._src.base.chex.Array":
    """Global L2 norm of a gradient tree. Non-finite values propagate, so
    ``isfinite(fast_global_norm(g))`` doubles as the NaN/Inf gradient check
    (the trainer's fused guard).

    Two real implementations, selectable for A/B via ``impl`` or the
    ``TIC_GRAD_NORM_IMPL`` env var (read at trace time):

    - ``'leafsum'`` (default): per-leaf ``sum(x*x)`` then a scalar add
      chain. Reads each gradient exactly once; the ~300 small reductions
      overlap with neighboring DMA. Step-level A/B on the ViT-L train step
      (tools/bench_guard.py, v5e, b192): 335.8 img/s.
    - ``'concat'``: flatten + concat + one big reduce. One fused reduction,
      but the concat materializes a second ~1.2 GB copy of ViT-L's f32
      grads (3x the minimal traffic): 332.3 img/s. (Round-1 per-op traces
      that picked concat were misled by unoverlapped small-reduce times;
      the step-level A/B reverses the call.)
    - ``'off'``: returns 0.0 — measurement floor only (340.9 img/s); the
      trainer's guard degrades to ``isfinite(loss)`` and the grad_norm
      metric reads 0. Not shippable: loses the grad-finiteness check.
    """
    import os

    import jax
    import jax.numpy as jnp

    impl = impl or os.environ.get("TIC_GRAD_NORM_IMPL", "leafsum")
    leaves = jax.tree_util.tree_leaves(tree)
    if impl == "off" or not leaves:
        return jnp.zeros(())
    if impl == "concat":
        flat = (jnp.concatenate([jnp.ravel(x) for x in leaves])
                if len(leaves) > 1 else jnp.ravel(leaves[0]))
        return jnp.sqrt(jnp.sum(jnp.square(flat)))
    if impl != "leafsum":
        raise ValueError(f"Unknown grad-norm impl: {impl}")
    total = jnp.zeros((), jnp.float32)
    for x in leaves:
        total = total + jnp.sum(jnp.square(x.astype(jnp.float32)))
    return jnp.sqrt(total)
