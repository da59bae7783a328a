"""Shape/dtype/grad sanity for the model families on tiny configs.

Replaces the reference's inline ``__main__`` smoke checks
(``TIC/ResNet/model.py:280-296``) with real unit tests.
"""
import dataclasses

import jax
import jax.numpy as jnp
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
