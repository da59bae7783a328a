"""Fused patch embedding as a Pallas TPU kernel.

Space-to-depth + projection matmul + bias for one image per grid step: the
(H/P * W/P, P*P*C) patch matrix is built in VMEM from the raw image block and
immediately multiplied on the MXU — the patch matrix never exists in HBM.
Equivalent math to ``models.vit.PatchEmbed`` (stride-P conv); used when
``ViTConfig.patch_embed_impl == 'pallas'``.

Interpreter mode on non-TPU backends keeps it testable on the CPU mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import _pallas_compat as pltpu_compat


def _kernel(img_ref, w_ref, b_ref, o_ref, *, patch: int):
    img = img_ref[0]                       # (H, W, C)
    h, w, c = img.shape
    gh, gw = h // patch, w // patch
    x = img.reshape(gh, patch, gw, patch, c)
    x = x.transpose(0, 2, 1, 3, 4)         # (gh, gw, p, p, c)
    x = x.reshape(gh * gw, patch * patch * c)
    y = jax.lax.dot_general(
        x, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = (y + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _unfold(images: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, C) -> (B, N, P*P*C) in (ph, pw, c) order."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


def _fold(unfolded: jax.Array, patch: int, h: int, w: int, c: int) -> jax.Array:
    """Inverse of :func:`_unfold`."""
    b = unfolded.shape[0]
    gh, gw = h // patch, w // patch
    x = unfolded.reshape(b, gh, gw, patch, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _pallas_forward(images, kernel, bias, patch: int):
    b, h, w, c = images.shape
    n = (h // patch) * (w // patch)
    d = kernel.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel, patch=patch),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu_compat.VMEM),
            pl.BlockSpec((kernel.shape[0], d), lambda i: (0, 0),
                         memory_space=pltpu_compat.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu_compat.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu_compat.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), images.dtype),
        interpret=pltpu_compat.should_interpret(),
    )(images, kernel, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_patch_embed(images: jax.Array, kernel: jax.Array, bias: jax.Array,
                       patch: int) -> jax.Array:
    """images (B, H, W, C) x kernel (P*P*C, D) + bias (D,) -> (B, N, D).

    Pallas forward; plain-XLA backward (unfold is a pure permutation, so the
    gradients are simple matmuls — no kernel needed)."""
    return _pallas_forward(images, kernel, bias, patch)


def _fwd(images, kernel, bias, patch):
    return _pallas_forward(images, kernel, bias, patch), (images, kernel)


def _bwd(patch, res, g):
    images, kernel = res
    b, h, w, c = images.shape
    unfolded = _unfold(images, patch)                         # (B, N, K)
    gf = g.astype(jnp.float32)
    d_kernel = jnp.einsum("bnk,bnd->kd", unfolded.astype(jnp.float32), gf)
    d_bias = jnp.sum(gf, axis=(0, 1))
    d_unfolded = jnp.einsum("bnd,kd->bnk", gf, kernel.astype(jnp.float32))
    d_images = _fold(d_unfolded, patch, h, w, c)
    return (d_images.astype(images.dtype), d_kernel.astype(kernel.dtype),
            d_bias.astype(kernel.dtype))


pallas_patch_embed.defvjp(_fwd, _bwd)
