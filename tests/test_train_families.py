"""MoE/TreeViT training through the unified Trainer; CLI plumbing; serving
export roundtrip."""
import dataclasses

import jax
import numpy as np
import pytest

from touhouimageclassification_tpu.config import (
    AugmentConfig, CheckpointConfig, MixConfig, MoEConfig, OptimizerConfig,
    TrainConfig, TreeViTConfig, ViTConfig,
)
from touhouimageclassification_tpu.data.folder import scan_image_folder, random_split
from touhouimageclassification_tpu.data.loader import HostImageLoader
from touhouimageclassification_tpu.models.resmoe import MoEClassifier
from touhouimageclassification_tpu.models.treevit import TreeViT
from touhouimageclassification_tpu.train import cli as tcli
from touhouimageclassification_tpu.train.tasks import (
    MoETask, TreeFullTask, TreeRootTask, TreeSonsTask,
)
from touhouimageclassification_tpu.train.trainer import Trainer
from touhouimageclassification_tpu.train import treevit as treevit_cli

from fixtures import make_image_folder

N_CLASSES = 4
TINY_VIT = ViTConfig(image_size=16, patch_size=8, hidden_size=16, num_layers=1,
                     num_heads=2, mlp_dim=32, num_classes=N_CLASSES)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("fam_data")
    return make_image_folder(str(root), num_classes=N_CLASSES, per_class=8, size=24)


def _cfg(tmp_path, **over):
    defaults = dict(
        train_id="fam_run",
        model_type="vit-moe",
        global_batch_size=8,
        max_epochs=1,
        seed=0,
        optimizer=OptimizerConfig(name="sgd", learning_rate=1e-2),
        augment=AugmentConfig(enable_augmentation=False),
        mix=MixConfig(enable_mixup=False),
        checkpoint=CheckpointConfig(directory=str(tmp_path / "ckpt"), top_k=1,
                                    monitor="val_loss", mode="min",
                                    every_n_epochs=1, async_save=False),
        log_dir=str(tmp_path / "log"),
        early_stop_patience=0,
        early_stop_monitor="val_loss",
        early_stop_mode="min",
    )
    defaults.update(over)
    return TrainConfig(**defaults)


def _loaders(dataset, batch=8):
    index = scan_image_folder(dataset)
    tr, va = random_split(len(index), 0.75, seed=0)
    train = HostImageLoader(index, tr, batch_size=batch, canvas=(16, 16),
                            shuffle=True, seed=0, drop_last=True)
    val = HostImageLoader(index, va, batch_size=batch, canvas=(16, 16),
                          shuffle=False, drop_last=False)
    return train, val


def test_canvas_for():
    rrc = TrainConfig(augment=AugmentConfig())
    plain = TrainConfig(augment=AugmentConfig(enable_augmentation=False))
    grey = TrainConfig(augment=AugmentConfig(only_grey_augmentation=True))
    assert tcli.canvas_for(rrc, (224, 224)) == (256, 256)
    assert tcli.canvas_for(plain, (224, 224)) == (224, 224)
    assert tcli.canvas_for(grey, (224, 224)) == (224, 224)


def test_category_map_utils():
    classes = [f"c{i}" for i in range(10)]
    m = treevit_cli.default_category_map(classes, 3)
    assert set(m) == set(classes)
    c2i = {c: i for i, c in enumerate(sorted(classes))}
    arr = treevit_cli.make_class_to_category(m, c2i)
    assert arr.shape == (10,)
    assert arr.max() + 1 == 3 or arr.max() + 1 == 4  # ceil partition


def test_moe_sparse_trains(dataset, tmp_path):
    moe_cfg = MoEConfig(num_experts=3, top_k=2, num_classes=N_CLASSES,
                        routing="sparse", capacity_factor=2.0, expert_vit=TINY_VIT)
    model = MoEClassifier(moe_cfg)
    cfg = _cfg(tmp_path, max_epochs=2)
    trainer = Trainer(cfg, model=model, task=MoETask(moe_cfg))
    train, val = _loaders(dataset)
    history = trainer.fit(train, val, resume=False)
    assert len(history) == 2
    assert np.isfinite(history[-1]["train_loss"])
    assert "val_acc" in history[-1]


def test_treevit_staged_masks(dataset, tmp_path):
    tree_cfg = TreeViTConfig(num_categories=2, num_classes=N_CLASSES, top_k=1,
                             capacity_factor=4.0, vit=TINY_VIT)
    model = TreeViT(tree_cfg)
    index = scan_image_folder(dataset)
    cmap = treevit_cli.make_class_to_category(
        treevit_cli.default_category_map(index.classes, 2), index.class_to_idx
    )
    train, val = _loaders(dataset)

    # stage: root — sons must not move
    cfg = _cfg(tmp_path, train_id="tree_root", model_type="tree-vit")
    t_root = Trainer(cfg, model=model, task=TreeRootTask(tree_cfg, cmap),
                     param_filter=treevit_cli._mask_for_stage("root"))
    t_root.fit(train, val, resume=False)
    p = jax.device_get(t_root.state.params)
    init = model.init(jax.random.key(cfg.seed),
                      np.zeros((1, 16, 16, 3), np.float32))["params"]
    sons_moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(p["sons"]),
                        jax.tree_util.tree_leaves(init["sons"]))
    )
    root_moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(p["root"]),
                        jax.tree_util.tree_leaves(init["root"]))
    )
    assert root_moved and not sons_moved

    # stage: sons — teacher-forced routing, root frozen
    cfg2 = _cfg(tmp_path, train_id="tree_sons", model_type="tree-vit")
    t_sons = Trainer(cfg2, model=model, task=TreeSonsTask(tree_cfg, cmap),
                     param_filter=treevit_cli._mask_for_stage("sons"),
                     init_params=p)
    h = t_sons.fit(train, val, resume=False)
    assert np.isfinite(h[-1]["train_loss"])
    p2 = jax.device_get(t_sons.state.params)
    root_moved_2 = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(p2["root"]),
                        jax.tree_util.tree_leaves(p["root"]))
    )
    assert not root_moved_2

    # stage: full
    cfg3 = _cfg(tmp_path, train_id="tree_full", model_type="tree-vit")
    t_full = Trainer(cfg3, model=model, task=TreeFullTask(tree_cfg, cmap),
                     init_params=p2)
    h = t_full.fit(train, val, resume=False)
    assert np.isfinite(h[-1]["train_loss"])


def test_export_for_serving_roundtrip(dataset, tmp_path):
    from touhouimageclassification_tpu.models.vit import ViT
    from touhouimageclassification_tpu.infer.serve import Predictor, load_weights

    model = ViT(TINY_VIT)
    cfg = _cfg(tmp_path, train_id="exp_run", model_type="vit-base",
               optimizer=OptimizerConfig(name="adamw", learning_rate=1e-3))
    trainer = Trainer(cfg, model=model)
    train, val = _loaders(dataset)
    trainer.fit(train, val, resume=False)

    out = str(tmp_path / "serving_params")
    tcli.export_for_serving(cfg, trainer, out)
    params, model_state = load_weights(out)
    index = scan_image_folder(dataset)
    pred = Predictor(model=model, params=params, model_state=model_state,
                     class_to_idx=index.class_to_idx, image_size=(16, 16),
                     mean=np.array([0.485, 0.456, 0.406]),
                     std=np.array([0.229, 0.224, 0.225]))
    names_conf = pred.predict_images([__import__("PIL.Image", fromlist=["Image"]).open(index.paths[0])])
    assert names_conf[0][0] in index.class_to_idx
