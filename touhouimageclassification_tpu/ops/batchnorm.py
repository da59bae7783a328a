"""BatchNorm variants for the ResNet BN-cost experiment (VERDICT r3 #2).

Context (tools/roofline_resnet.py, RESULTS.md "Per-stage roofline"):
training-mode BatchNorm statistics passes cost ~27% of the ResNet-152
forward. ``flax.linen.BatchNorm`` already computes the batch moments in a
single fused read (E[x], E[x²] in one pass, f32); what costs HBM time is
(a) that reduce pass over each conv output and (b) the normalize pass
being SERIALIZED after it (it cannot fuse into the conv epilogue the way
inference-mode BN does). Variants, A/B'd on chip by ``tools/bench_bn.py``:

- ``batch``: hand-rolled parity with ``flax.linen.BatchNorm`` (same math,
  same parameter/variable names) — the control that prices the module
  swap itself.
- ``ghost``: batch statistics from the first ``1/ghost_factor`` of the
  batch rows — cuts the stats reduce's read traffic by that factor
  (ghost-BN in reverse: fewer samples per statistic, same normalization).
  Statistics are noisier but computed from i.i.d. samples of the batch
  (loader order is shuffled), so training is expected to tolerate it.
- ``stale``: normalize with the RUNNING statistics (as in inference — the
  normalize carries no data dependency on this step's reduce and can fuse
  into the conv epilogue) while still measuring the batch moments to
  update the EMA. Removes the reduce→normalize serialization entirely at
  the price of normalizing by slightly stale (EMA, momentum 0.9) stats.
  **Throughput-only** (+18.6% on the ResNet-152 step, ``tools/bench_bn``):
  the accuracy A/B (``tools/bn_acc_ab.py``, chip, 3 seeds) shows scratch
  training DIVERGES under it — early in training the EMA lags the
  drifting activation statistics and the error compounds across the
  stacked BNs until the loss overflows (all seeds NaN, chance accuracy).
  Use for step-time studies, never for from-scratch training.

Reference anchor: BN is half the layer count of the reference's ResNet
(``TIC/ResNet/model.py:296``); torch trains it with cuDNN's fused
batch-stats kernels — these variants are the TPU-side equivalents.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class BatchNormVariant(nn.Module):
    """Drop-in BatchNorm with selectable statistics strategy.

    Parameter names (``scale``/``bias``) and variable names
    (``batch_stats/{mean,var}``) match ``flax.linen.BatchNorm`` so
    checkpoints are interchangeable across variants.
    """

    variant: str = "batch"              # 'batch' | 'ghost' | 'stale'
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    ghost_factor: int = 4
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (feat,))
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (feat,))
        scale = self.param("scale", self.scale_init, (feat,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          self.param_dtype)

        if self.use_running_average:
            norm_mean, norm_var = ra_mean.value, ra_var.value
        else:
            # read the EMA BEFORE updating it: 'stale' normalizes by the
            # previous steps' statistics
            ema_mean, ema_var = ra_mean.value, ra_var.value
            stats_x = x
            if self.variant == "ghost" and x.shape[0] > 1:
                rows = max(1, x.shape[0] // self.ghost_factor)
                stats_x = x[:rows]
            xf = stats_x.astype(jnp.float32)
            axes = tuple(range(xf.ndim - 1))
            # one fused read: both moments from the same pass
            mean = jnp.mean(xf, axes)
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axes) - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ema_mean + (1 - m) * mean
                ra_var.value = m * ema_var + (1 - m) * var
            if self.variant == "stale":
                norm_mean, norm_var = ema_mean, ema_var
            else:
                norm_mean, norm_var = mean, var

        mul = (scale.astype(jnp.float32)
               * jnp.reciprocal(jnp.sqrt(norm_var + self.epsilon)))
        y = ((x.astype(jnp.float32) - norm_mean) * mul
             + bias.astype(jnp.float32))
        return y.astype(self.dtype)
