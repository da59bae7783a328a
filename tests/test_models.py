"""Shape/dtype/grad sanity for the model families on tiny configs.

Replaces the reference's inline ``__main__`` smoke checks
(``TIC/ResNet/model.py:280-296``) with real unit tests.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touhouimageclassification_tpu.config import ResNetConfig, ViTConfig
from touhouimageclassification_tpu.models import ViT, create_model, resnet
from touhouimageclassification_tpu.models.resnet import ResNet

TINY_VIT = ViTConfig(
    image_size=32, patch_size=16, hidden_size=64, num_layers=2, num_heads=4,
    mlp_dim=128, num_classes=7,
)


def test_vit_forward_shape():
    model = ViT(TINY_VIT)
    x = jnp.ones((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (2, 7)
    assert logits.dtype == jnp.float32


def test_vit_rejects_wrong_image_size():
    model = ViT(TINY_VIT)
    x = jnp.ones((1, 64, 64, 3))
    with pytest.raises(ValueError, match="spatial size"):
        model.init(jax.random.key(0), x)


def test_vit_grads_finite():
    model = ViT(TINY_VIT)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    y = jnp.array([1, 3])
    params = model.init(jax.random.key(0), x)

    def loss_fn(p):
        logits = model.apply(p, x)
        return jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(2), y]
        )

    g = jax.jit(jax.grad(loss_fn))(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(jnp.isfinite(leaf).all() for leaf in flat)
    # every parameter receives gradient signal somewhere
    assert any(jnp.abs(leaf).max() > 0 for leaf in flat)


@pytest.mark.parametrize("depth", [18, 50])
def test_resnet_forward_shape(depth):
    model = resnet(depth, num_classes=5, image_size=64)
    x = jnp.ones((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    assert "batch_stats" in variables
    logits = model.apply(variables, x)
    assert logits.shape == (2, 5)


def test_resnet_train_mode_updates_stats():
    model = resnet(18, num_classes=5, image_size=32)
    x = jax.random.normal(jax.random.key(0), (4, 32, 32, 3))
    variables = model.init(jax.random.key(1), x)
    logits, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert logits.shape == (4, 5)
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not jnp.allclose(a, b) for a, b in zip(old, new))


def test_resnet_bn_variants_match_flax():
    """The hand-rolled 'batch' BN variant is numerically flax.BatchNorm
    (same params/variables — checkpoints interchange); 'ghost'/'stale'
    produce finite outputs, update running stats, and share the param
    tree. 'stale' must normalize by the PRE-update EMA (ops/batchnorm.py,
    the BN-cost experiment of VERDICT r3 #2)."""
    def make(variant="flax"):
        return ResNet(ResNetConfig(depth=18, num_classes=5, image_size=32,
                                   bn_variant=variant),
                      compute_dtype="float32")

    x = jax.random.normal(jax.random.key(0), (8, 32, 32, 3), jnp.float32)
    ref = make()
    variables = ref.init(jax.random.key(1), x)
    ref_logits, ref_updates = ref.apply(variables, x, train=True,
                                        mutable=["batch_stats"])

    batch = make("batch")
    # identical param tree: flax variables load straight into the variant
    got_logits, got_updates = batch.apply(variables, x, train=True,
                                          mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(ref_updates),
                    jax.tree_util.tree_leaves(got_updates)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    for variant in ("ghost", "stale"):
        m = make(variant)
        logits, updates = m.apply(variables, x, train=True,
                                  mutable=["batch_stats"])
        assert np.isfinite(np.asarray(logits)).all()
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(not jnp.allclose(a, b) for a, b in zip(old, new)), variant
        # eval mode is plain running-stats BN for every variant
        ev = m.apply(variables, x)
        np.testing.assert_allclose(np.asarray(ev), np.asarray(ref.apply(variables, x)),
                                   rtol=2e-4, atol=2e-4)

    # grads flow through every variant's train path
    for variant in ("batch", "ghost", "stale"):
        m = make(variant)

        def loss_fn(p):
            out, _ = m.apply({**variables, "params": p}, x, train=True,
                             mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        g = jax.grad(loss_fn)(variables["params"])
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g)), variant


def test_resnet_all_depth_factories():
    from touhouimageclassification_tpu.models import (
        resnet18, resnet34, resnet50, resnet101, resnet152,
    )
    for factory, depth in [(resnet18, 18), (resnet34, 34), (resnet50, 50),
                           (resnet101, 101), (resnet152, 152)]:
        m = factory(num_classes=3)
        assert isinstance(m, ResNet)
        assert m.cfg.depth == depth


def test_create_model_dispatch():
    assert isinstance(create_model("vit-base", num_classes=9), ViT)
    assert create_model("vit-base").cfg.hidden_size == 768
    assert create_model("vit-large").cfg.hidden_size == 1024
    assert isinstance(create_model("resnet34", num_classes=9), ResNet)
    with pytest.raises(ValueError):
        create_model("alexnet")


def test_vit_jit_compiles_once():
    model = ViT(TINY_VIT)
    x = jnp.ones((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    fn = jax.jit(lambda p, x: model.apply(p, x))
    a = fn(params, x)
    b = fn(params, x * 2)
    assert a.shape == b.shape == (2, 7)
