"""steps_per_call > 1: k fused scan steps must match k separate steps."""
import dataclasses

import jax
import numpy as np

from touhouimageclassification_tpu.config import (
    AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig, TrainConfig,
    ViTConfig,
)
from touhouimageclassification_tpu.models.vit import ViT
from touhouimageclassification_tpu.parallel.mesh import create_mesh, data_sharding
from touhouimageclassification_tpu.train.trainer import Trainer

TINY = ViTConfig(image_size=16, patch_size=8, hidden_size=16, num_layers=1,
                 num_heads=2, mlp_dim=32, num_classes=4)


def _cfg(tmp_path, **over):
    base = dict(
        train_id="scan_run", model_type="vit-base", global_batch_size=8,
        seed=0, max_epochs=1,
        optimizer=OptimizerConfig(name="sgd", learning_rate=1e-2),
        augment=AugmentConfig(enable_augmentation=False),
        mix=MixConfig(enable_mixup=False),
        checkpoint=CheckpointConfig(directory=str(tmp_path / "c"), async_save=False),
        log_dir=str(tmp_path / "l"),
    )
    base.update(over)
    return TrainConfig(**base)


def _batches(n, b=8):
    rng = np.random.default_rng(0)
    return [
        {"image": rng.integers(0, 256, (b, 16, 16, 3)).astype(np.uint8),
         "label": (np.arange(b) % 4).astype(np.int32),
         "mask": np.ones((b,), bool)}
        for _ in range(n)
    ]


def test_scan_equals_sequential(tmp_path):
    mesh = create_mesh(num_data=2, devices=jax.devices()[:2])
    batches = _batches(4)

    # sequential
    tr1 = Trainer(_cfg(tmp_path), model=ViT(TINY, compute_dtype="float32"), mesh=mesh)
    s1 = tr1.init_state(4)
    step = tr1._make_train_step()
    for b in batches:
        s1, m1 = step(s1, jax.device_put(b, data_sharding(mesh)))

    # fused scan, k=4
    cfg2 = _cfg(tmp_path, steps_per_call=4)
    tr2 = Trainer(cfg2, model=ViT(TINY, compute_dtype="float32"), mesh=mesh)
    s2 = tr2.init_state(4)
    scan = tr2._make_train_scan(4)
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    from jax.sharding import NamedSharding, PartitionSpec as P

    s2, m2 = scan(s2, jax.device_put(stacked, NamedSharding(mesh, P(None, "data"))))

    assert int(s1.step) == int(s2.step) == 4
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fit_with_steps_per_call(tmp_path):
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from fixtures import make_image_folder
    from touhouimageclassification_tpu.data.folder import scan_image_folder
    from touhouimageclassification_tpu.data.loader import HostImageLoader

    data = make_image_folder(str(tmp_path / "d"), num_classes=4, per_class=8, size=20)
    index = scan_image_folder(data)
    loader = HostImageLoader(index, batch_size=8, canvas=(16, 16), shuffle=True,
                             seed=0, drop_last=True)
    cfg = _cfg(tmp_path, steps_per_call=2, max_epochs=2)
    tr = Trainer(cfg, model=ViT(TINY))
    hist = tr.fit(loader, None, resume=False)
    assert len(hist) == 2
    assert int(tr.state.step) == 2 * (len(loader) // 2 * 2)
    assert np.isfinite(hist[-1]["train_loss"])
