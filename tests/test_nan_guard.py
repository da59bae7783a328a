"""The fused NaN guard must skip non-finite updates and pass finite ones."""
import jax
import jax.numpy as jnp
import numpy as np

from touhouimageclassification_tpu.config import (
    AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig, TrainConfig,
    ViTConfig,
)
from touhouimageclassification_tpu.models.vit import ViT
from touhouimageclassification_tpu.parallel.mesh import create_mesh, data_sharding
from touhouimageclassification_tpu.train.optim import fast_global_norm
from touhouimageclassification_tpu.train.trainer import Trainer

TINY = ViTConfig(image_size=16, patch_size=8, hidden_size=16, num_layers=1,
                 num_heads=2, mlp_dim=32, num_classes=4)


def test_fast_global_norm_matches_optax():
    import optax

    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "b": [jnp.ones((4,)), jnp.full((2, 2), -2.0)]}
    np.testing.assert_allclose(
        float(fast_global_norm(tree)), float(optax.global_norm(tree)), rtol=1e-6
    )


def test_fast_global_norm_propagates_nan():
    tree = {"a": jnp.ones((3,)), "b": jnp.array([jnp.nan])}
    assert not np.isfinite(float(fast_global_norm(tree)))


def test_fast_global_norm_impls_agree():
    """'concat' and 'leafsum' are interchangeable numerics (A/B'd for speed
    in tools/bench_guard.py); 'off' is the measurement floor (always 0)."""
    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "b": [jnp.ones((4,), jnp.bfloat16), jnp.full((2, 2), -2.0)]}
    np.testing.assert_allclose(
        float(fast_global_norm(tree, impl="concat")),
        float(fast_global_norm(tree, impl="leafsum")), rtol=1e-6,
    )
    assert float(fast_global_norm(tree, impl="off")) == 0.0
    bad = {"a": jnp.ones((3,)), "b": jnp.array([jnp.inf])}
    assert not np.isfinite(float(fast_global_norm(bad, impl="leafsum")))


def _make_trainer(tmp_path, nan_guard=True):
    cfg = TrainConfig(
        train_id="nan_run", model_type="vit-base", global_batch_size=8,
        seed=0, nan_guard=nan_guard,
        optimizer=OptimizerConfig(name="sgd", learning_rate=1e-2),
        augment=AugmentConfig(enable_augmentation=False),
        mix=MixConfig(enable_mixup=False),
        checkpoint=CheckpointConfig(directory=str(tmp_path / "c"), async_save=False),
        log_dir=str(tmp_path / "l"),
    )
    mesh = create_mesh(num_data=1, devices=jax.devices()[:1])
    return Trainer(cfg, model=ViT(TINY, compute_dtype="float32"), mesh=mesh), mesh


def test_nan_batch_skips_update(tmp_path):
    trainer, mesh = _make_trainer(tmp_path)
    state = trainer.init_state(4)
    step = trainer._make_train_step()

    # poison: NaN image makes loss/grads NaN (float conversion keeps NaN?
    # uint8 can't carry NaN -> poison params instead via a huge LR spike:
    # easier: poison the params to produce inf logits)
    bad_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) * 1e38 if x.ndim == 2 else x, state.params
    )
    state = state.replace(params=bad_params)
    before = jax.device_get(state.params)
    batch = jax.device_put(
        {"image": np.full((8, 16, 16, 3), 255, np.uint8),
         "label": np.zeros((8,), np.int32),
         "mask": np.ones((8,), bool)},
        data_sharding(mesh),
    )
    new_state, metrics = step(state, batch)
    assert not np.isfinite(float(metrics["loss"])) or not np.isfinite(
        float(metrics["grad_norm"])
    )
    after = jax.device_get(new_state.params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_state.step) == 1  # step counter still advances


def test_nan_batch_skips_batch_stats(tmp_path):
    """model_state is guarded too: a NaN batch must not commit its BatchNorm
    running stats (they'd poison every later forward even with the params
    update skipped)."""
    from touhouimageclassification_tpu.models import resnet

    cfg = TrainConfig(
        train_id="nan_bn", model_type="resnet18", global_batch_size=8,
        seed=0, nan_guard=True,
        optimizer=OptimizerConfig(name="sgd", learning_rate=1e-2),
        augment=AugmentConfig(enable_augmentation=False),
        mix=MixConfig(enable_mixup=False),
        checkpoint=CheckpointConfig(directory=str(tmp_path / "c"), async_save=False),
        log_dir=str(tmp_path / "l"),
    )
    mesh = create_mesh(num_data=1, devices=jax.devices()[:1])
    trainer = Trainer(cfg, model=resnet(18, num_classes=4, image_size=16),
                      mesh=mesh)
    state = trainer.init_state(4)
    assert state.model_state, "resnet18 must carry batch_stats"
    step = trainer._make_train_step()
    bad_params = jax.tree_util.tree_map(
        lambda x: jnp.where(jnp.isfinite(x), x * 1e38, x)
        if x.ndim >= 2 else x, state.params,
    )
    state = state.replace(params=bad_params)
    before_ms = jax.device_get(state.model_state)
    batch = jax.device_put(
        {"image": np.full((8, 16, 16, 3), 255, np.uint8),
         "label": np.zeros((8,), np.int32),
         "mask": np.ones((8,), bool)},
        data_sharding(mesh),
    )
    new_state, metrics = step(state, batch)
    assert not np.isfinite(float(metrics["loss"])) or not np.isfinite(
        float(metrics["grad_norm"])
    )
    after_ms = jax.device_get(new_state.model_state)
    for a, b in zip(jax.tree_util.tree_leaves(before_ms),
                    jax.tree_util.tree_leaves(after_ms)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_finite_batch_updates(tmp_path):
    trainer, mesh = _make_trainer(tmp_path)
    state = trainer.init_state(4)
    step = trainer._make_train_step()
    before = jax.device_get(state.params)
    batch = jax.device_put(
        {"image": np.random.default_rng(0).integers(0, 256, (8, 16, 16, 3)).astype(np.uint8),
         "label": np.arange(8, dtype=np.int32) % 4,
         "mask": np.ones((8,), bool)},
        data_sharding(mesh),
    )
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    after = jax.device_get(new_state.params)
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after))
    )
    assert changed
