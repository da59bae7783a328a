"""Pallas fused patch-embed parity with the XLA PatchEmbed module."""
import jax
import jax.numpy as jnp
import numpy as np

from touhouimageclassification_tpu.config import ViTConfig
from touhouimageclassification_tpu.models.vit import ViT


def _cfg(impl):
    return ViTConfig(image_size=32, patch_size=16, hidden_size=64, num_layers=1,
                     num_heads=2, mlp_dim=128, num_classes=5,
                     patch_embed_impl=impl)


def test_pallas_patch_embed_matches_xla():
    from touhouimageclassification_tpu.ops.patch_embed import pallas_patch_embed

    rng = jax.random.key(0)
    imgs = jax.random.normal(rng, (3, 32, 32, 3))
    kernel = jax.random.normal(jax.random.key(1), (16 * 16 * 3, 64)) * 0.02
    bias = jax.random.normal(jax.random.key(2), (64,)) * 0.1
    out = pallas_patch_embed(imgs, kernel, bias, 16)
    # oracle: unfold in the same (ph, pw, c) order + matmul
    x = imgs.reshape(3, 2, 16, 2, 16, 3).transpose(0, 1, 3, 2, 4, 5).reshape(3, 4, -1)
    ref = x @ kernel + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_vit_with_pallas_patch_embed_runs():
    model = ViT(_cfg("pallas"), compute_dtype="float32")
    x = jnp.ones((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (2, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_pallas_patch_embed_gradients():
    """custom VJP: gradients must match the XLA unfold+matmul path."""
    from touhouimageclassification_tpu.ops.patch_embed import pallas_patch_embed

    imgs = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    kernel = jax.random.normal(jax.random.key(1), (16 * 16 * 3, 32)) * 0.02
    bias = jnp.zeros((32,))

    def loss_pallas(i, k, b):
        return jnp.sum(pallas_patch_embed(i, k, b, 16) ** 2)

    def loss_ref(i, k, b):
        x = i.reshape(2, 2, 16, 2, 16, 3).transpose(0, 1, 3, 2, 4, 5).reshape(2, 4, -1)
        return jnp.sum((x @ k + b) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(imgs, kernel, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(imgs, kernel, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_vit_pallas_patch_embed_shares_param_tree():
    """Params created on the pallas path must load on the xla path and
    vice versa (converter compatibility)."""
    m_x = ViT(_cfg("xla"), compute_dtype="float32")
    m_p = ViT(_cfg("pallas"), compute_dtype="float32")
    x = jnp.ones((1, 32, 32, 3))
    params = m_x.init(jax.random.key(0), x)
    a = m_x.apply(params, x)
    b = m_p.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
