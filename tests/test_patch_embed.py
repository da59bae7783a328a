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


def test_pallas_patch_embed_partitions_over_batch_mesh():
    """Same SPMD obligation as the attention kernels: on a batch-sharded
    mesh the custom call must run per-shard (no all-gather of the image
    batch), keep the output batch-sharded, and match the XLA math."""
    import re

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from touhouimageclassification_tpu.ops.patch_embed import pallas_patch_embed

    devs = jax.devices()
    assert len(devs) >= 8, "conftest forces an 8-device CPU mesh"
    mesh = Mesh(np.array(devs[:8]), ("data",))
    imgs = jax.random.normal(jax.random.key(0), (16, 32, 32, 3))
    kernel = jax.random.normal(jax.random.key(1), (16 * 16 * 3, 64)) * 0.02
    bias = jax.random.normal(jax.random.key(2), (64,)) * 0.1
    sharded = jax.device_put(
        imgs, NamedSharding(mesh, P("data", None, None, None)))

    fwd = jax.jit(lambda i, k, b: pallas_patch_embed(i, k, b, 16))
    out = fwd(sharded, kernel, bias)
    x = imgs.reshape(16, 2, 16, 2, 16, 3).transpose(
        0, 1, 3, 2, 4, 5).reshape(16, 4, -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ kernel + bias),
                               atol=1e-5, rtol=1e-5)
    assert out.sharding.spec[0] == "data", out.sharding
    hlo = fwd.lower(sharded, kernel, bias).compile().as_text()
    assert not re.search("all-gather|all-to-all", hlo), "image batch gathered"


def test_pallas_patch_embed_under_vmap():
    """nn.vmap'd experts: shared weights flatten into the kernel batch;
    per-expert weights fall back to the XLA math — both must match vmapping
    the reference."""
    from touhouimageclassification_tpu.ops.patch_embed import pallas_patch_embed

    imgs = jax.random.normal(jax.random.key(0), (4, 2, 32, 32, 3))
    k_shared = jax.random.normal(jax.random.key(1), (16 * 16 * 3, 32)) * 0.02
    b_shared = jax.random.normal(jax.random.key(2), (32,)) * 0.1
    k_exp = jax.random.normal(jax.random.key(3), (4, 16 * 16 * 3, 32)) * 0.02
    b_exp = jax.random.normal(jax.random.key(4), (4, 32)) * 0.1

    def ref(i, k, b):
        x = i.reshape(2, 2, 16, 2, 16, 3).transpose(
            0, 1, 3, 2, 4, 5).reshape(2, 4, -1)
        return x @ k + b

    out_shared = jax.vmap(
        lambda i: pallas_patch_embed(i, k_shared, b_shared, 16))(imgs)
    np.testing.assert_allclose(
        np.asarray(out_shared),
        np.asarray(jax.vmap(lambda i: ref(i, k_shared, b_shared))(imgs)),
        atol=1e-5, rtol=1e-5)

    out_exp = jax.vmap(
        lambda i, k, b: pallas_patch_embed(i, k, b, 16))(imgs, k_exp, b_exp)
    np.testing.assert_allclose(
        np.asarray(out_exp), np.asarray(jax.vmap(ref)(imgs, k_exp, b_exp)),
        atol=1e-5, rtol=1e-5)

    # gradients flow through both vmap branches
    g = jax.grad(lambda i: jnp.sum(jax.vmap(
        lambda im, k, b: pallas_patch_embed(im, k, b, 16)
    )(i, k_exp, b_exp) ** 2))(imgs)
    assert np.isfinite(np.asarray(g)).all()
