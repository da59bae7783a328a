"""ResNet family (18/34/50/101/152), TPU-first Flax implementation.

Capability parity with the reference's from-scratch torchvision-style ResNet
(``TIC/ResNet/model.py:17-276``: BasicBlock, Bottleneck, 7x7 stem, 4 stages,
kaiming init, optional zero-init of the last BN in each residual branch).
Differences are deliberate TPU choices, not omissions:

- NHWC layout (XLA:TPU's native conv layout),
- BatchNorm via ``flax.linen.BatchNorm`` with a ``batch_stats`` collection
  (functional running stats instead of in-place buffers),
- compute in bfloat16, params/statistics in float32.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ResNetConfig
from ..ops.batchnorm import BatchNormVariant

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _norm_partial(bn_variant: str, train: bool, dtype) -> partial:
    """BatchNorm factory: 'flax' is the shipped default; 'batch'/'ghost'/
    'stale' are the BN-cost experiment variants (ops/batchnorm.py,
    A/B'd by tools/bench_bn.py)."""
    if bn_variant == "flax":
        return partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32,
        )
    return partial(
        BatchNormVariant, variant=bn_variant, use_running_average=not train,
        momentum=0.9, epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32,
    )


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.bfloat16
    zero_init_residual: bool = False
    bn_variant: str = "flax"

    expansion = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = partial(
            nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=_KAIMING,
        )
        norm = _norm_partial(self.bn_variant, train, self.dtype)
        residual = x
        y = conv(self.filters, (3, 3), strides=(self.strides, self.strides), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), name="conv2")(y)
        last_bn = norm(
            name="bn2",
            scale_init=nn.initializers.zeros if self.zero_init_residual
            else nn.initializers.ones,
        )
        y = last_bn(y)
        if residual.shape != y.shape:
            residual = conv(self.filters, (1, 1), strides=(self.strides, self.strides),
                            name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.bfloat16
    zero_init_residual: bool = False
    bn_variant: str = "flax"

    expansion = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = partial(
            nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=_KAIMING,
        )
        norm = _norm_partial(self.bn_variant, train, self.dtype)
        residual = x
        y = conv(self.filters, (1, 1), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), strides=(self.strides, self.strides), name="conv2")(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.filters * 4, (1, 1), name="conv3")(y)
        last_bn = norm(
            name="bn3",
            scale_init=nn.initializers.zeros if self.zero_init_residual
            else nn.initializers.ones,
        )
        y = last_bn(y)
        if residual.shape != y.shape:
            residual = conv(self.filters * 4, (1, 1), strides=(self.strides, self.strides),
                            name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


_LAYOUTS: dict[int, tuple[type, Sequence[int]]] = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


class ResNet(nn.Module):
    """ResNet classifier. ``__call__(x, train)`` -> logits (B, num_classes).

    When ``train=True`` the caller must mark ``batch_stats`` mutable:
    ``model.apply(vars, x, train=True, mutable=['batch_stats'])``.
    """

    cfg: ResNetConfig
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[self.compute_dtype]
        block_cls, stages = _LAYOUTS[self.cfg.depth]
        x = x.astype(dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=dtype, param_dtype=jnp.float32, kernel_init=_KAIMING,
                    name="stem_conv")(x)
        x = _norm_partial(self.cfg.bn_variant, train, dtype)(name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for stage, num_blocks in enumerate(stages):
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = block_cls(
                    filters=64 * 2 ** stage,
                    strides=strides,
                    dtype=dtype,
                    zero_init_residual=self.cfg.zero_init_residual,
                    bn_variant=self.cfg.bn_variant,
                    name=f"stage{stage + 1}_block{block}",
                )(x, train=train)

        x = jnp.mean(x, axis=(1, 2))           # global average pool
        logits = nn.Dense(self.cfg.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
                          name="head")(x.astype(jnp.float32))
        return logits


def resnet(depth: int, num_classes: int = 120, **kw) -> ResNet:
    """Depth factories mirroring ``resnet18/34/50/101/152``
    (``TIC/ResNet/model.py:249-276``)."""
    return ResNet(ResNetConfig(depth=depth, num_classes=num_classes, **kw))


resnet18 = partial(resnet, 18)
resnet34 = partial(resnet, 34)
resnet50 = partial(resnet, 50)
resnet101 = partial(resnet, 101)
resnet152 = partial(resnet, 152)
