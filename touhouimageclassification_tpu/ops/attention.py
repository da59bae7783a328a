"""Fused multi-head attention as a Pallas TPU kernel.

The reference delegates attention to cuDNN via HF torch (SURVEY §2 notes the
native obligation is replacing dependency-provided fast paths). Here the
whole attention for one (batch, head) — QK^T, scaling, padding mask, f32
softmax, PV — runs in one Pallas kernel: logits never round-trip to HBM and
the softmax stays in VMEM. ViT's sequence (197 = 196 patches + CLS) is padded
to a 128-lane-friendly length inside the wrapper; padded key columns are
masked with -inf (a compile-time mask — seq_len is static).

Backward: custom VJP that recomputes the attention matrix with plain XLA ops
(N is small — 256 — so the dense recompute is cheap and XLA fuses it);
the forward never materializes probabilities in HBM.

On non-TPU backends the kernel runs in interpreter mode so the same tests
cover it everywhere.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import _pallas_compat as pltpu_compat


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


HEAD_GROUP = 4  # heads per grid step: bounds the (G, N_pad, N_pad) f32
                # logits block to ~1 MB so the kernel fits VMEM at any batch


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    """One (image, head-group) per grid step: q/k/v refs are
    (1, G, N_pad, D). The group axis rides the MXU's batched matmul —
    far fewer grid iterations than per-(batch, head), with VMEM bounded by
    the group size."""
    q = q_ref[0]            # (G, N_pad, D)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale               # (H, N_pad, N_pad) in f32
    n_pad = s.shape[-1]
    if n_valid < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                        # (H, N_pad, D)
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_forward(q, k, v):
    """q,k,v: (B, N, H, D) -> out (B, N, H, D)."""
    b, n, h, d = q.shape
    scale = d ** -0.5
    n_pad = max(_round_up(n, 128), 128)
    g = math.gcd(h, HEAD_GROUP)  # always divides h (h=6 -> groups of 2)
    n_groups = h // g

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3))                 # (B, H, N, D)
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))

    qf, kf, vf = prep(q), prep(k), prep(v)

    kernel = functools.partial(_attention_kernel, n_valid=n, scale=scale)
    spec = pl.BlockSpec(
        (1, g, n_pad, d), lambda i, j: (i, j, 0, 0),
        memory_space=pltpu_compat.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_groups),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d), q.dtype),
        interpret=pltpu_compat.should_interpret(),
    )(qf, kf, vf)
    return jnp.transpose(out[:, :, :n, :], (0, 2, 1, 3))


def _reference_attention(q, k, v):
    """Plain XLA path (used for backward recompute and as numerics oracle)."""
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d ** -0.5)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@jax.custom_vjp
def _own_flash_attention(q, k, v):
    return _flash_forward(q, k, v)


def _fwd(q, k, v):
    return _flash_forward(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_reference_attention, q, k, v)
    return vjp(g)


_own_flash_attention.defvjp(_fwd, _bwd)


def _tpu_builtin_flash(q, k, v):
    """jax.experimental.pallas.ops.tpu.flash_attention — the tuned upstream
    kernel (fwd + dq/dkv backward kernels). Sequence padded to a block
    multiple; padded keys masked via segment ids; padded query rows are
    sliced off."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, n, h, d = q.shape
    n_pad = max(_round_up(n, 128), 128)

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3))                # (B, H, N, D)
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))

    qf, kf, vf = prep(q), prep(k), prep(v)
    valid = (jnp.arange(n_pad) < n).astype(jnp.int32)[None, :]
    seg = jnp.broadcast_to(valid, (b, n_pad))
    # padded tokens get segment 0, valid tokens segment 1 -> no cross access
    segment_ids = fa.SegmentIds(q=seg, kv=seg)
    out = fa.flash_attention(
        qf, kf, vf, segment_ids=segment_ids, sm_scale=d ** -0.5
    )                                                      # (B, H, N_pad, D)
    return jnp.transpose(out[:, :, :n, :], (0, 2, 1, 3))


def flash_attention(q, k, v):
    """Fused attention: the upstream tuned TPU kernel on TPU backends, this
    module's (interpreter-capable) kernel elsewhere."""
    if pltpu_compat.should_interpret():
        return _own_flash_attention(q, k, v)
    return _tpu_builtin_flash(q, k, v)
