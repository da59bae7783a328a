"""On-device image augmentation: the reference's CPU-worker hot loop, jitted.

The reference runs torchvision-v2 transforms in DataLoader worker processes
(``TIC/ViT/ntrain.py:96-136``, five recipes; hot loop per SURVEY §3.1). Here
the host only decodes JPEGs to a fixed-size uint8 canvas; *all* random
augmentation runs on-device as one jitted, batched, static-shape function, so
it fuses with the training step and rides the VPU instead of host cores.

Semantics follow torchvision's samplers:

- RandomResizedCrop: area ~ U(scale)*A, log-aspect ~ U(log(ratio)); resize via
  ``jax.image.scale_and_translate`` (bilinear, antialiased — matching
  v2's ``antialias=True`` default). Where torchvision rejection-samples up to
  10 attempts then falls back to center-crop, we clamp the sampled box to the
  canvas — a one-shot, branch-free equivalent (documented deviation; the
  sampled distributions agree except on the rare rejection tail).
- ColorJitter(brightness, contrast, saturation, hue): factor distributions
  match torchvision (uniform in [1-x, 1+x]; hue in [-h, h] as a fraction of a
  full hue circle). torchvision permutes the four op order per sample; we
  apply a fixed order b->c->s->h (documented deviation).
- RandomGrayscale: ITU-R 601-2 luma (0.299, 0.587, 0.114), as PIL's 'L'.
- RandomErasing: p=0.5, area ~ U(0.02, 0.33), log-aspect ~ U(log(0.3, 3.3)),
  erase value 0, box clamped instead of rejection-sampled.
- Normalize: (x - mean) / std with ImageNet statistics.

All functions take images as float32/bfloat16 NHWC in [0, 1].
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AugmentConfig

# numpy on purpose: a module-level jnp.array would initialize the XLA
# backend at import time, breaking jax.distributed.initialize ordering for
# multi-host CLIs (it must run before ANY backend use); jit lifts this to a
# device constant at trace time either way
_LUMA = np.array([0.299, 0.587, 0.114], np.float32)


# ---------------------------------------------------------------------------
# geometry
#
# Resize is implemented as two small matmuls with interpolation-weight
# matrices built on the fly: out = W_h @ img @ W_w^T per channel. On TPU this
# rides the MXU instead of compiling to gather chains (jax.image.resize with
# antialias is also pathologically slow to compile), and it naturally extends
# to per-image crop boxes (RandomResizedCrop) as a batched einsum with traced
# crop parameters — no dynamic shapes anywhere.
# ---------------------------------------------------------------------------

def _linear_resize_weights(in_size: int, out_size: int, crop_size, offset):
    """(out_size, in_size) antialiased-linear interpolation matrix for
    resampling ``[offset, offset + crop_size)`` of an ``in_size`` axis.

    ``crop_size``/``offset`` may be traced scalars (or vectors of shape (B,)
    — then the result is (B, out_size, in_size)). Triangle kernel with
    support max(crop/out, 1), rows renormalized (PIL-style edge handling).
    """
    crop_size = jnp.asarray(crop_size, jnp.float32)
    offset = jnp.asarray(offset, jnp.float32)
    scale = crop_size / out_size                       # input px per output px
    support = jnp.maximum(scale, 1.0)
    o = jnp.arange(out_size, dtype=jnp.float32)
    centers = (o + 0.5) * scale[..., None] - 0.5 + offset[..., None]   # (..., out)
    i = jnp.arange(in_size, dtype=jnp.float32)
    dist = jnp.abs(i - centers[..., None]) / support[..., None, None]  # (..., out, in)
    w = jnp.clip(1.0 - dist, 0.0, None)
    return w / jnp.maximum(w.sum(-1, keepdims=True), 1e-8)


def crop_and_resize(
    images: jax.Array, top, left, crop_h, crop_w, out_size: tuple[int, int]
) -> jax.Array:
    """Per-image crop-box resample. (B,H,W,C), per-image traced boxes ->
    (B,out_h,out_w,C). Two batched matmuls on the MXU."""
    _, h, w, _ = images.shape
    f32 = images.astype(jnp.float32)
    wh = _linear_resize_weights(h, out_size[0], crop_h, top)     # (B, oh, H)
    ww = _linear_resize_weights(w, out_size[1], crop_w, left)    # (B, ow, W)
    y = jnp.einsum("boi,bijc->bojc", wh, f32)
    y = jnp.einsum("bpj,bojc->bopc", ww, y)
    return y.astype(images.dtype)


def random_resized_crop(
    key: jax.Array,
    images: jax.Array,
    out_size: tuple[int, int],
    scale: tuple[float, float] = (0.08, 1.0),
    ratio: tuple[float, float] = (3 / 4, 4 / 3),
) -> jax.Array:
    """Batched RandomResizedCrop. images: (B, H, W, C) -> (B, out_h, out_w, C)."""
    b, h, w, _ = images.shape
    k_area, k_ratio, k_top, k_left = jax.random.split(key, 4)
    area = jax.random.uniform(k_area, (b,), minval=scale[0], maxval=scale[1]) * (h * w)
    log_ratio = jax.random.uniform(
        k_ratio, (b,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    crop_w = jnp.clip(jnp.sqrt(area * aspect), 1.0, w)
    crop_h = jnp.clip(jnp.sqrt(area / aspect), 1.0, h)
    top = jax.random.uniform(k_top, (b,)) * (h - crop_h)
    left = jax.random.uniform(k_left, (b,)) * (w - crop_w)
    return crop_and_resize(images, top, left, crop_h, crop_w, out_size)


def resize(images: jax.Array, out_size: tuple[int, int]) -> jax.Array:
    """Batched deterministic antialiased-linear resize (the v2.Resize
    analogue; a 2-tuple size resizes to exactly (h, w), no aspect
    preservation — what every reference recipe uses)."""
    _, h, w, _ = images.shape
    f32 = images.astype(jnp.float32)
    wh = _linear_resize_weights(h, out_size[0], float(h), 0.0)   # (oh, H)
    ww = _linear_resize_weights(w, out_size[1], float(w), 0.0)   # (ow, W)
    y = jnp.einsum("oi,bijc->bojc", wh, f32)
    y = jnp.einsum("pj,bojc->bopc", ww, y)
    return y.astype(images.dtype)


def random_hflip(key: jax.Array, images: jax.Array, p: float = 0.5) -> jax.Array:
    b = images.shape[0]
    flip = jax.random.bernoulli(key, p, (b,))
    return jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)


# ---------------------------------------------------------------------------
# color
# ---------------------------------------------------------------------------

def _grayscale(images: jax.Array) -> jax.Array:
    g = jnp.tensordot(images, _LUMA.astype(images.dtype), axes=[[-1], [0]])
    return g[..., None] * jnp.ones((3,), images.dtype)


def _adjust_brightness(images, factor):
    # torchvision's _blend clamps after EVERY adjust op (not once at the
    # end): an op that saturates must feed the clamped value into the next
    # op's blend/means, or bright regions diverge from the reference
    return jnp.clip(images * factor[:, None, None, None], 0.0, 1.0)


def _adjust_contrast(images, factor):
    # torchvision: blend with the mean of the grayscale image
    mean = jnp.mean(
        jnp.tensordot(images, _LUMA.astype(images.dtype), axes=[[-1], [0]]),
        axis=(1, 2), keepdims=True,
    )[..., None]
    f = factor[:, None, None, None]
    return jnp.clip(images * f + mean * (1.0 - f), 0.0, 1.0)


def _adjust_saturation(images, factor):
    gray = _grayscale(images)
    f = factor[:, None, None, None]
    return jnp.clip(images * f + gray * (1.0 - f), 0.0, 1.0)


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    safe_delta = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _adjust_hue(images, shift):
    hsv = _rgb_to_hsv(jnp.clip(images.astype(jnp.float32), 0.0, 1.0))
    h = (hsv[..., 0] + shift[:, None, None]) % 1.0
    out = _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))
    return out.astype(images.dtype)


def color_jitter(
    key: jax.Array,
    images: jax.Array,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    hue: float = 0.1,
) -> jax.Array:
    """Per-image factors; fixed op order b->c->s->h (see module docstring)."""
    b = images.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    if brightness > 0:
        f = jax.random.uniform(kb, (b,), minval=1 - brightness, maxval=1 + brightness)
        images = _adjust_brightness(images, f)
    if contrast > 0:
        f = jax.random.uniform(kc, (b,), minval=1 - contrast, maxval=1 + contrast)
        images = _adjust_contrast(images, f)
    if saturation > 0:
        f = jax.random.uniform(ks, (b,), minval=1 - saturation, maxval=1 + saturation)
        images = _adjust_saturation(images, f)
    if hue > 0:
        shift = jax.random.uniform(kh, (b,), minval=-hue, maxval=hue)
        images = _adjust_hue(images, shift)
    return jnp.clip(images, 0.0, 1.0)


def random_grayscale(key: jax.Array, images: jax.Array, p: float = 0.2) -> jax.Array:
    b = images.shape[0]
    on = jax.random.bernoulli(key, p, (b,))
    return jnp.where(on[:, None, None, None], _grayscale(images), images)


# ---------------------------------------------------------------------------
# erasing
# ---------------------------------------------------------------------------

def random_erasing(
    key: jax.Array,
    images: jax.Array,
    p: float = 0.5,
    scale: tuple[float, float] = (0.02, 0.33),
    ratio: tuple[float, float] = (0.3, 3.3),
    value: float = 0.0,
) -> jax.Array:
    b, h, w, _ = images.shape
    k_on, k_area, k_ratio, k_top, k_left = jax.random.split(key, 5)
    on = jax.random.bernoulli(k_on, p, (b,))
    area = jax.random.uniform(k_area, (b,), minval=scale[0], maxval=scale[1]) * (h * w)
    log_ratio = jax.random.uniform(
        k_ratio, (b,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    eh = jnp.clip(jnp.sqrt(area / aspect), 1.0, h)
    ew = jnp.clip(jnp.sqrt(area * aspect), 1.0, w)
    top = jax.random.uniform(k_top, (b,)) * (h - eh)
    left = jax.random.uniform(k_left, (b,)) * (w - ew)

    rows = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    inside = (
        (rows >= top[:, None, None]) & (rows < (top + eh)[:, None, None])
        & (cols >= left[:, None, None]) & (cols < (left + ew)[:, None, None])
    )
    mask = inside & on[:, None, None]
    return jnp.where(mask[..., None], jnp.asarray(value, images.dtype), images)


# ---------------------------------------------------------------------------
# normalize + recipes
# ---------------------------------------------------------------------------

def normalize(images: jax.Array, mean, std) -> jax.Array:
    mean = jnp.asarray(mean, images.dtype)
    std = jnp.asarray(std, images.dtype)
    return (images - mean) / std


def build_augment_fn(
    cfg: AugmentConfig, out_size: tuple[int, int]
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Compile-time selection of one of the five reference recipes
    (``TIC/ViT/ntrain.py:96-136``). Returns ``fn(key, images01) -> normalized``.

    The returned function is pure and jittable; callers fold it into the
    train step so augmentation fuses with the forward pass.
    """

    def eval_fn(key, images):
        del key
        return normalize(resize(images, out_size), cfg.mean, cfg.std)

    if not cfg.enable_augmentation:
        return eval_fn

    if cfg.only_grey_augmentation:
        def grey_fn(key, images):
            images = resize(images, out_size)
            images = random_grayscale(key, images, cfg.grayscale_prob)
            return normalize(images, cfg.mean, cfg.std)
        return grey_fn

    div, gen = cfg.enable_diversity, cfg.enable_generalization

    def fn(key, images):
        keys = jax.random.split(key, 5)
        if gen:
            images = random_resized_crop(
                keys[0], images, out_size, cfg.rrc_scale, cfg.rrc_ratio
            )
            images = random_hflip(keys[1], images, cfg.hflip_prob)
        else:
            images = resize(images, out_size)
        if div:
            images = color_jitter(
                keys[2], images, cfg.brightness, cfg.contrast, cfg.saturation, cfg.hue
            )
            images = random_grayscale(keys[3], images, cfg.grayscale_prob)
        if gen:
            images = random_erasing(
                keys[4], images, cfg.erasing_prob, cfg.erasing_scale, cfg.erasing_ratio
            )
        return normalize(images, cfg.mean, cfg.std)

    return fn


def build_eval_fn(cfg: AugmentConfig, out_size: tuple[int, int]):
    """resize + normalize only (val/test transform, ``ntrain.py:142-147``)."""
    def fn(images):
        return normalize(resize(images, out_size), cfg.mean, cfg.std)
    return fn
