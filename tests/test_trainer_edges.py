"""Trainer/CLI edge cases from the round-3 core review: --test guard rails,
empty validation splits, stacked-iterator tail accounting, early-stop state
persistence across resume, mesh validation, and multi-host init ordering."""
import argparse
import dataclasses
import logging
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from touhouimageclassification_tpu.config import (
    AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig, TrainConfig,
    ViTConfig,
)
from touhouimageclassification_tpu.models import ViT
from touhouimageclassification_tpu.train.trainer import Trainer

from fixtures import make_image_folder

N_CLASSES = 3
TINY = ViTConfig(image_size=32, patch_size=8, hidden_size=32, num_layers=1,
                 num_heads=2, mlp_dim=64, num_classes=N_CLASSES)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("edata")
    return make_image_folder(str(root), num_classes=N_CLASSES, per_class=8,
                             size=32)


def _cfg(tmp_path, dataset, **over):
    defaults = dict(
        train_id="edge_run",
        model_type="vit-base",
        data_dir=dataset,
        global_batch_size=8,
        max_epochs=2,
        seed=0,
        optimizer=OptimizerConfig(name="adamw", learning_rate=3e-3,
                                  weight_decay=0.0),
        augment=AugmentConfig(),
        mix=MixConfig(enable_mixup=False),
        checkpoint=CheckpointConfig(
            directory=str(tmp_path / "ckpt"), top_k=2, monitor="val_acc",
            every_n_epochs=0, async_save=False,
        ),
        log_dir=str(tmp_path / "log"),
        early_stop_patience=0,
    )
    defaults.update(over)
    return TrainConfig(**defaults)


def _cli_args(**over):
    ns = argparse.Namespace(
        restore=None, no_resume=False, test=False, transform=None,
        data_dir=None, max_epochs=None, batch_size=None, lr=None,
        schedule=None, coordinator=None, num_processes=None, process_id=None,
    )
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def test_test_mode_requires_checkpoint(dataset, tmp_path):
    """--test on a run with no checkpoints must raise instead of silently
    printing a chance-level score for randomly initialized weights."""
    from touhouimageclassification_tpu.train.cli import run

    cfg = _cfg(tmp_path, dataset)
    with pytest.raises(FileNotFoundError, match="--test"):
        run(cfg, _cli_args(test=True), model=ViT(TINY))


def test_empty_val_split_degrades_to_no_val(dataset, tmp_path):
    """train_split=1.0: build_loaders returns val=None (train-loss fallback
    drives checkpoint ranking) instead of an empty loader."""
    from touhouimageclassification_tpu.train.cli import build_loaders

    cfg = _cfg(tmp_path, dataset, train_split=1.0)
    train, val, test, _ = build_loaders(cfg, (32, 32))
    assert val is None
    assert train.steps_per_epoch() > 0


def test_evaluate_empty_loader_raises(dataset, tmp_path):
    """An eval pass with zero valid samples must fail loudly, not feed a NaN
    val_loss into the checkpoint metrics."""
    from touhouimageclassification_tpu.data.folder import scan_image_folder
    from touhouimageclassification_tpu.data.loader import HostImageLoader

    cfg = _cfg(tmp_path, dataset)
    trainer = Trainer(cfg, model=ViT(TINY))
    trainer.state = trainer.init_state()
    index = scan_image_folder(dataset)
    empty = HostImageLoader(index, np.array([], np.int64), batch_size=8,
                            canvas=(32, 32), drop_last=False)
    with pytest.raises(ValueError, match="no valid samples"):
        trainer.evaluate(empty)


def test_stacked_iterator_floors_steps_with_warning(dataset, tmp_path, caplog):
    """steps_per_call not dividing steps/epoch: the dropped tail is announced
    and the epoch still trains the whole-group prefix."""
    from touhouimageclassification_tpu.data.folder import (random_split,
                                                           scan_image_folder)
    from touhouimageclassification_tpu.data.loader import HostImageLoader

    index = scan_image_folder(dataset)  # 24 images
    tr, _ = random_split(len(index), 1.0, seed=0)
    # batch 8 (divisible over the 8-device mesh) -> 3 steps/epoch;
    # steps_per_call=2 leaves a 1-batch tail
    train = HostImageLoader(index, tr, batch_size=8, canvas=(32, 32),
                            shuffle=True, seed=0, drop_last=True)
    cfg = _cfg(tmp_path, dataset, global_batch_size=8, max_epochs=1,
               steps_per_call=2)
    trainer = Trainer(cfg, model=ViT(TINY))
    with caplog.at_level(logging.WARNING):
        history = trainer.fit(train, None, resume=False)
    assert any("does not divide" in r.message for r in caplog.records)
    assert len(history) == 1


def test_early_stop_state_survives_resume(dataset, tmp_path):
    """A resumed run must stop at the SAME epoch as an uninterrupted control:
    the stagnation counter travels with the checkpoint. lr=0 freezes the
    params so the monitored metric stagnates from epoch 2 on."""
    frozen = OptimizerConfig(name="adamw", learning_rate=0.0,
                             weight_decay=0.0)

    def make(max_epochs, run_id):
        cfg = _cfg(tmp_path, dataset, max_epochs=max_epochs,
                   optimizer=frozen, early_stop_patience=2, train_id=run_id)
        return cfg, Trainer(cfg, model=ViT(TINY))

    from touhouimageclassification_tpu.train.cli import build_loaders

    # control: epoch 1 sets best, epochs 2-3 stagnate -> stops after epoch 3
    cfg_c, control = make(10, "es_control")
    train, val, _, _ = build_loaders(cfg_c, (32, 32))
    h_control = control.fit(train, val, resume=False)
    assert len(h_control) == 3

    # interrupted at the epoch-2 boundary, then resumed
    cfg_a, part_a = make(2, "es_resumed")
    h_a = part_a.fit(train, val, resume=False)
    assert len(h_a) == 2
    cfg_b, part_b = make(10, "es_resumed")
    h_b = part_b.fit(train, val, resume=True)
    # without persisted since_best the resumed run would train 2 extra
    # epochs (4 and 5) before stopping; with it, epoch 3 is the last
    assert len(h_b) == 1
    assert len(h_a) + len(h_b) == len(h_control)


def test_create_mesh_validates_device_budget():
    from touhouimageclassification_tpu.parallel.mesh import create_mesh

    n = len(jax.devices())
    with pytest.raises(ValueError, match="devices"):
        create_mesh(num_expert=2 * n)  # num_data floors to 0
    with pytest.raises(ValueError, match="devices"):
        create_mesh(num_data=n, num_expert=2)  # 2n > n
    mesh = create_mesh(num_data=n)
    assert mesh.devices.size == n


def test_initialize_distributed_forwards_env_and_is_idempotent(monkeypatch):
    from touhouimageclassification_tpu.parallel import dist as D

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: calls.append(kw),
    )
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("COORDINATOR_ADDRESS", "head:1234")
    assert D.initialize_distributed() is True
    # the COORDINATOR_ADDRESS spelling must be forwarded explicitly (JAX only
    # reads JAX_COORDINATOR_ADDRESS on its own)
    assert calls and calls[0]["coordinator_address"] == "head:1234"

    # already-initialized: a second call (staged CLIs call run() per stage)
    # must be a no-op, not a hard jax.distributed.initialize crash
    from jax._src import distributed as jdist

    monkeypatch.setattr(jdist.global_state, "client", object(), raising=False)
    assert D.initialize_distributed() is True
    assert len(calls) == 1


def test_tree_tasks_do_not_touch_backend_at_construction():
    """Task construction happens before run() initializes multi-host JAX; a
    constructor-time jnp array would initialize the XLA backend too early.
    Proven in a subprocess so this test's own backend state can't mask it."""
    code = (
        "import numpy as np\n"
        "from touhouimageclassification_tpu.config import TreeViTConfig\n"
        "from touhouimageclassification_tpu.train.tasks import (\n"
        "    TreeRootTask, TreeSonsTask, TreeFullTask)\n"
        "cfg = TreeViTConfig(num_categories=2, num_classes=4)\n"
        "m = np.array([0, 0, 1, 1], np.int32)\n"
        "tasks = [TreeRootTask(cfg, m), TreeSonsTask(cfg, m),\n"
        "         TreeFullTask(cfg, m)]\n"
        "from jax._src import xla_bridge as xb\n"
        "assert not xb._backends, 'task ctor initialized the XLA backend'\n"
        "print('CLEAN')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=240,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0, out.stderr
    assert "CLEAN" in out.stdout


def test_cli_seed_override():
    """--seed overrides the preset seed, including seed 0 (a falsy value a
    plain `if args.seed` would drop); absent flag keeps the preset's."""
    from touhouimageclassification_tpu.config import PRESETS
    from touhouimageclassification_tpu.train.cli import (apply_overrides,
                                                         standard_argparser)

    p = standard_argparser("t")
    assert apply_overrides(PRESETS["nvit"], p.parse_args([])).seed == 42
    assert apply_overrides(PRESETS["nvit"],
                           p.parse_args(["--seed", "7"])).seed == 7
    assert apply_overrides(PRESETS["nvit"],
                           p.parse_args(["--seed", "0"])).seed == 0
