"""Batch-level CutMix-or-MixUp, jitted.

Parity target: ``v2.RandomChoice([v2.CutMix(...), v2.MixUp(...)])`` applied
per training batch (``TIC/ViT/ntrain.py:30-33,45-46``). torchvision semantics
reproduced:

- one coin flip per batch chooses CutMix vs MixUp,
- lambda ~ Beta(alpha, alpha) with alpha=1 (uniform) by default,
- the "partner" sample is the batch rolled by 1 (torchvision rolls, it does
  not permute),
- CutMix cuts a centered-at-uniform box with half-sides ~ sqrt(1-lambda) and
  recomputes lambda from the clipped box area,
- labels become soft: lam * y + (1 - lam) * y_rolled (one-hot inputs).

Returns (mixed_images, soft_labels). Everything is static-shape and folds
into the jitted train step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _mixup(key, images, labels, alpha):
    lam = jax.random.beta(key, alpha, alpha)
    mixed = lam * images + (1.0 - lam) * jnp.roll(images, 1, axis=0)
    soft = lam * labels + (1.0 - lam) * jnp.roll(labels, 1, axis=0)
    return mixed.astype(images.dtype), soft


def _cutmix(key, images, labels, alpha):
    b, h, w, _ = images.shape
    k_lam, k_y, k_x = jax.random.split(key, 3)
    lam = jax.random.beta(k_lam, alpha, alpha)
    cut = jnp.sqrt(1.0 - lam)
    cut_h, cut_w = cut * h, cut * w
    cy = jax.random.uniform(k_y) * h
    cx = jax.random.uniform(k_x) * w
    y0 = jnp.clip(cy - cut_h / 2, 0, h)
    y1 = jnp.clip(cy + cut_h / 2, 0, h)
    x0 = jnp.clip(cx - cut_w / 2, 0, w)
    x1 = jnp.clip(cx + cut_w / 2, 0, w)

    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    in_box = (rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1)
    mixed = jnp.where(in_box[None, :, :, None], jnp.roll(images, 1, axis=0), images)
    # effective lambda from the clipped box (torchvision recomputes it)
    lam_eff = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)
    soft = lam_eff * labels + (1.0 - lam_eff) * jnp.roll(labels, 1, axis=0)
    return mixed.astype(images.dtype), soft


def cutmix_or_mixup(
    key: jax.Array,
    images: jax.Array,
    labels_onehot: jax.Array,
    mixup_alpha: float = 1.0,
    cutmix_alpha: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """One batch-level RandomChoice between CutMix and MixUp."""
    k_choice, k_op = jax.random.split(key)
    use_cutmix = jax.random.bernoulli(k_choice, 0.5)
    return jax.lax.cond(
        use_cutmix,
        lambda k: _cutmix(k, images, labels_onehot, cutmix_alpha),
        lambda k: _mixup(k, images, labels_onehot, mixup_alpha),
        k_op,
    )
