"""ResNet-152 from-scratch training throughput on the chip.

The reference's strongest non-ViT baseline (``TIC/ResNet/train.py:213-241``:
SGD 5e-2 StepLR, batch 80, 256x256, ~68.2% top-1). Measures the real
Trainer step — BatchNorm batch_stats update + SGD — on synthetic uint8
batches, same chained methodology as bench.py. FLOP note: ResNet-152 at
256x256 is ~15 GFLOP/img fwd, ~45 GFLOP/img trained.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import dataclasses

    import jax

    from touhouimageclassification_tpu.config import PRESETS
    from touhouimageclassification_tpu.models.resnet import resnet
    from touhouimageclassification_tpu.parallel.mesh import (
        create_mesh, data_sharding,
    )
    from touhouimageclassification_tpu.train.trainer import Trainer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    n_dev = len(jax.devices())
    mesh = create_mesh(num_data=n_dev)
    cfg = dataclasses.replace(
        PRESETS["resnet152"], train_id="bench_resnet",
        global_batch_size=batch, log_dir="/tmp/tic_bench_resnet_log",
    )
    trainer = Trainer(cfg, model=resnet(152, num_classes=120), mesh=mesh)
    state = trainer.init_state(steps_per_epoch=100)
    step_fn = trainer._make_train_step()

    rng = np.random.default_rng(0)
    b = {
        "image": rng.integers(0, 256, (batch, 256, 256, 3)).astype(np.uint8),
        "label": (np.arange(batch) % 120).astype(np.int32),
        "mask": np.ones((batch,), bool),
    }
    db = jax.device_put(b, data_sharding(mesh))
    for _ in range(2):
        state, metrics = step_fn(state, db)
    float(metrics["loss"])  # sync (relay rules)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, db)
    float(metrics["loss"])
    rate = batch * steps / (time.perf_counter() - t0) / n_dev
    print(json.dumps({
        "metric": "resnet152_scratch_images_per_sec_per_chip",
        "value": round(rate, 2), "unit": "img/s/chip",
        "batch": batch,
    }), flush=True)


if __name__ == "__main__":
    main()
