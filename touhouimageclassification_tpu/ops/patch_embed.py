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


def _xla_forward(images, kernel, bias, patch: int):
    """Reference math (used by the expert-vmap fallback below)."""
    y = jnp.einsum("bnk,kd->bnd", _unfold(images, patch).astype(jnp.float32),
                   kernel.astype(jnp.float32))
    return (y + bias.astype(jnp.float32)).astype(images.dtype)


# --- SPMD partitioning + vmap (same obligations as ops/attention.py) --------
#
# The pallas_call lowers to a custom call GSPMD cannot partition: without a
# rule, a batch-sharded mesh would all-gather the full image batch onto
# every device and run the embed redundantly. The kernel is batch-parallel
# (grid over images), so the rule shards ONLY the images/result batch dim
# and replicates the projection weights. custom_partitioning also has no
# batching rule, and the MoE/TreeViT expert stacks nn.vmap the whole ViT —
# the custom_vmap wrapper flattens an images-only mapped axis into the
# kernel batch; per-expert WEIGHTS (kernel/bias batched) fall back to the
# XLA math, which vmaps/partitions natively.


@functools.lru_cache(maxsize=None)
def _partitioned_forward(patch: int):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def fwd(images, kernel, bias):
        return _pallas_forward(images, kernel, bias, patch)

    def _batch0(mesh, sharding, rank):
        spec = getattr(sharding, "spec", None)
        first = spec[0] if spec is not None and len(spec) > 0 else None
        return NamedSharding(mesh, PartitionSpec(first, *([None] * (rank - 1))))

    def _repl(mesh, rank):
        return NamedSharding(mesh, PartitionSpec(*([None] * rank)))

    def infer(mesh, arg_shapes, result_shape):
        return _batch0(mesh, arg_shapes[0].sharding, len(result_shape.shape))

    def propagate(mesh, user_shape):
        return _batch0(mesh, user_shape.sharding, len(user_shape.shape))

    def partition(mesh, arg_shapes, result_shape):
        img = arg_shapes[0]
        arg_shardings = (
            _batch0(mesh, img.sharding, len(img.shape)),
            _repl(mesh, len(arg_shapes[1].shape)),
            _repl(mesh, len(arg_shapes[2].shape)),
        )
        result_sharding = _batch0(mesh, img.sharding, len(result_shape.shape))
        return mesh, fwd, result_sharding, arg_shardings

    cp = custom_partitioning(fwd)
    cp.def_partition(
        partition,
        propagate_user_sharding=propagate,
        infer_sharding_from_operands=infer,
        sharding_rule="b h w c, k d, d -> b n d",
        need_replication_factors=("h", "w", "c", "k", "d", "n"),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _vmappable_forward(patch: int):
    from jax.custom_batching import custom_vmap

    part = _partitioned_forward(patch)

    @custom_vmap
    def f(images, kernel, bias):
        return part(images, kernel, bias)

    @f.def_vmap
    def rule(axis_size, in_batched, images, kernel, bias):
        img_b, k_b, b_b = in_batched
        if img_b and not k_b and not b_b:
            # shared weights: the mapped axis folds into the kernel batch
            e, b = images.shape[:2]
            out = part(images.reshape(e * b, *images.shape[2:]), kernel, bias)
            return out.reshape(e, b, *out.shape[1:]), True
        # per-expert weights (or an unbatched image operand): XLA math,
        # which vmap and GSPMD both handle natively
        out = jax.vmap(
            lambda im, k, bi: _xla_forward(im, k, bi, patch),
            in_axes=(0 if img_b else None, 0 if k_b else None,
                     0 if b_b else None),
            axis_size=axis_size,
        )(images, kernel, bias)
        return out, True

    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_patch_embed(images: jax.Array, kernel: jax.Array, bias: jax.Array,
                       patch: int) -> jax.Array:
    """images (B, H, W, C) x kernel (P*P*C, D) + bias (D,) -> (B, N, D).

    Pallas forward (SPMD- and vmap-safe, see above); plain-XLA backward
    (unfold is a pure permutation, so the gradients are simple matmuls —
    no kernel needed)."""
    return _vmappable_forward(patch)(images, kernel, bias)


def _fwd(images, kernel, bias, patch):
    return _vmappable_forward(patch)(images, kernel, bias), (images, kernel)


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
