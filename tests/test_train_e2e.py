"""End-to-end: data -> augment -> DP train step over an 8-device mesh ->
checkpoint -> resume -> eval. The 'minimum end-to-end slice' of SURVEY §7."""
import dataclasses
import os

import jax
import numpy as np
import pytest

from touhouimageclassification_tpu.config import (
    AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig, TrainConfig,
)
from touhouimageclassification_tpu.data.folder import scan_image_folder, random_split
from touhouimageclassification_tpu.data.loader import HostImageLoader
from touhouimageclassification_tpu.models import ViT
from touhouimageclassification_tpu.models.resnet import resnet
from touhouimageclassification_tpu.config import ViTConfig
from touhouimageclassification_tpu.train.trainer import Trainer

from fixtures import make_image_folder

N_CLASSES = 4


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return make_image_folder(str(root), num_classes=N_CLASSES, per_class=16, size=48)


def _cfg(tmp_path, **over):
    defaults = dict(
        train_id="test_run",
        model_type="vit-base",
        global_batch_size=8,
        max_epochs=2,
        seed=0,
        optimizer=OptimizerConfig(name="adamw", learning_rate=3e-3, weight_decay=0.0),
        augment=AugmentConfig(),
        mix=MixConfig(enable_mixup=False),
        checkpoint=CheckpointConfig(
            directory=str(tmp_path / "ckpt"), top_k=2, monitor="val_acc",
            every_n_epochs=1, async_save=False,
        ),
        log_dir=str(tmp_path / "log"),
        early_stop_patience=0,
    )
    defaults.update(over)
    return TrainConfig(**defaults)


def _loaders(dataset, batch=8, canvas=(48, 48)):
    index = scan_image_folder(dataset)
    tr, va = random_split(len(index), 0.75, seed=0)
    train = HostImageLoader(index, tr, batch_size=batch, canvas=canvas, shuffle=True,
                            seed=0, drop_last=True)
    val = HostImageLoader(index, va, batch_size=batch, canvas=canvas, shuffle=False,
                          drop_last=False)
    return train, val


TINY = ViTConfig(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                 num_heads=2, mlp_dim=64, num_classes=N_CLASSES)


def test_vit_trains_and_learns(dataset, tmp_path):
    cfg = _cfg(tmp_path, max_epochs=4)
    model = ViT(TINY)
    trainer = Trainer(cfg, model=model)
    train, val = _loaders(dataset)
    history = trainer.fit(train, val, resume=False)
    assert len(history) == 4
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    # solid-color classes should be learnable well above chance (0.25)
    assert history[-1]["val_acc"] > 0.4
    assert os.path.exists(os.path.join(cfg.log_dir, "test_run", "metrics.jsonl"))


def test_checkpoint_resume(dataset, tmp_path):
    cfg = _cfg(tmp_path, max_epochs=2)
    model = ViT(TINY)

    def make_trainer():
        return Trainer(cfg, model=model)

    train, val = _loaders(dataset)
    t1 = make_trainer()
    h1 = t1.fit(train, val, resume=False)
    assert len(h1) == 2
    step_after = int(t1.state.step)

    # resume: latest epoch == max_epochs -> no more training, state restored
    cfg3 = dataclasses.replace(cfg, max_epochs=3)
    t2 = make_trainer()
    t2.cfg = cfg3
    h2 = t2.fit(train, val, resume=True)
    assert len(h2) == 1          # only epoch 3 runs
    assert int(t2.state.step) > step_after


def test_resnet_trains_with_batchstats(dataset, tmp_path):
    cfg = _cfg(tmp_path, model_type="resnet18",
               optimizer=OptimizerConfig(name="sgd", learning_rate=1e-2, schedule="step"),
               augment=AugmentConfig(enable_augmentation=False), max_epochs=1)
    model = resnet(18, num_classes=N_CLASSES, image_size=32)
    trainer = Trainer(cfg, model=model)
    train, val = _loaders(dataset)
    history = trainer.fit(train, val, resume=False)
    assert np.isfinite(history[0]["train_loss"])
    # batch_stats must have been threaded through the step
    stats = jax.tree_util.tree_leaves(trainer.state.model_state["batch_stats"])
    assert any(np.abs(np.asarray(s)).sum() > 0 for s in stats)


def test_mixup_path_in_trainer(dataset, tmp_path):
    cfg = _cfg(tmp_path, mix=MixConfig(enable_mixup=True), max_epochs=1)
    model = ViT(TINY)
    trainer = Trainer(cfg, model=model)
    train, val = _loaders(dataset)
    history = trainer.fit(train, val, resume=False)
    assert np.isfinite(history[0]["train_loss"])


def test_loader_early_break_releases_producer(dataset):
    """Breaking out of a loader mid-epoch must not wedge the producer thread
    (review finding: q.put blocked forever on a full queue)."""
    import threading
    import time

    from touhouimageclassification_tpu.data.folder import scan_image_folder
    from touhouimageclassification_tpu.data.loader import HostImageLoader

    index = scan_image_folder(dataset)
    before = threading.active_count()
    for _ in range(5):
        loader = HostImageLoader(index, batch_size=4, canvas=(24, 24),
                                 prefetch_batches=1)
        it = iter(loader)
        next(it)
        it.close()  # early break
    time.sleep(1.0)  # let cancelled producers notice and exit
    after = threading.active_count()
    assert after - before <= 1
