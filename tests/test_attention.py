"""Numerics parity of the Pallas fused attention against the XLA oracle
(interpreter mode on CPU; the same kernel compiles on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touhouimageclassification_tpu.ops.attention import (
    _reference_attention,
    flash_attention,
)


def _qkv(b=2, n=197, h=4, d=64, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    shape = (b, n, h, d)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


def test_forward_matches_reference_f32():
    q, k, v = _qkv()
    out = flash_attention(q, k, v)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_forward_matches_reference_bf16():
    q, k, v = _qkv(dtype=jnp.bfloat16)
    out = flash_attention(q, k, v).astype(jnp.float32)
    ref = _reference_attention(q, k, v).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_padding_mask_excludes_padded_keys():
    """Result for n=197 must equal a manually padded n=256 computation only
    when the mask works; compare against unpadded reference."""
    q, k, v = _qkv(n=130)  # forces padding to 256
    out = flash_attention(q, k, v)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_gradients_match_reference():
    q, k, v = _qkv(b=1, n=64, h=2, d=32)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v) ** 2)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_vit_with_flash_attention_matches_xla():
    from touhouimageclassification_tpu.config import ViTConfig
    from touhouimageclassification_tpu.models.vit import ViT

    base = dict(image_size=32, patch_size=8, hidden_size=64, num_layers=2,
                num_heads=2, mlp_dim=128, num_classes=5)
    m_xla = ViT(ViTConfig(**base, attention_impl="xla"), compute_dtype="float32")
    m_flash = ViT(ViTConfig(**base, attention_impl="flash"), compute_dtype="float32")
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    params = m_xla.init(jax.random.key(1), x)
    a = m_xla.apply(params, x)
    b = m_flash.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4)


def test_non_multiple_head_counts():
    """Head counts not divisible by the head-group size (e.g. 6) must still
    compute every head (regression: groups previously truncated)."""
    for h in (3, 6, 5):
        q, k, v = _qkv(b=1, n=64, h=h, d=32, seed=h)
        out = flash_attention(q, k, v)
        ref = _reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
