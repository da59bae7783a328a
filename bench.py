"""Headline benchmark: ViT-Large finetune throughput (images/sec/chip).

Runs the REAL training step — on-device full augmentation recipe +
CutMix/MixUp + bf16 forward/backward + AdamW update, exactly the main-result
configuration (``TIC/ViT/ntrain.py:250-267``) — on synthetic data on the
local TPU chip, and prints one JSON line.

Baseline: the reference reports ~67 img/s for ViT-Large finetune at batch 30
fp16 on an RTX 3080 (report.pdf p.8 §4.3; BASELINE.md).

Usage: python bench.py [--batch 128] [--steps 20] [--serve]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASELINE_IMG_PER_SEC = 67.0  # RTX 3080 reference point (BASELINE.md)


def bench_train(batch: int, steps: int, warmup: int = 2, remat: bool = False,
                scan: int = 8) -> float:
    import jax

    from touhouimageclassification_tpu.config import (
        AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig, TrainConfig,
        VIT_LARGE,
    )
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from touhouimageclassification_tpu.models.vit import ViT
    from touhouimageclassification_tpu.parallel.mesh import create_mesh, data_sharding
    from touhouimageclassification_tpu.train.trainer import Trainer

    n_dev = len(jax.devices())
    mesh = create_mesh(num_data=n_dev)
    cfg = TrainConfig(
        train_id="bench",
        model_type="vit-large",
        global_batch_size=batch,
        optimizer=OptimizerConfig(name="adamw", learning_rate=1e-5, weight_decay=0.01),
        augment=AugmentConfig(),
        mix=MixConfig(enable_mixup=True),
        checkpoint=CheckpointConfig(async_save=False),
        log_dir="/tmp/tic_bench_log",
        steps_per_call=scan,
    )
    # sweep result (tools/bench_sweep.py): batch 128 fits without remat on a
    # 16 GB v5e and runs ~20% faster than the rematerialized step
    model = ViT(dataclasses.replace(VIT_LARGE, remat=remat))
    trainer = Trainer(cfg, model=model, mesh=mesh)
    state = trainer.init_state(steps_per_epoch=100)

    rng = np.random.default_rng(0)
    def batch_np(seed):
        r = np.random.default_rng(seed)
        return {
            "image": r.integers(0, 256, (batch, 256, 256, 3)).astype(np.uint8),
            "label": (np.arange(batch) % 120).astype(np.int32),
            "mask": np.ones((batch,), bool),
        }

    if scan > 1:
        # k fused optimizer steps per call (TrainConfig.steps_per_call — the
        # trainer's production fast path)
        step_fn = trainer._make_train_scan(scan)
        stacked = {
            key: np.stack([batch_np(s)[key] for s in range(scan)])
            for key in ("image", "label", "mask")
        }
        dbatch = jax.device_put(stacked, NamedSharding(mesh, P(None, "data")))
        per_call = scan
    else:
        step_fn = trainer._make_train_step()
        dbatch = jax.device_put(batch_np(0), data_sharding(mesh))
        per_call = 1

    calls = max(1, steps // per_call)
    for _ in range(warmup):
        state, metrics = step_fn(state, dbatch)
    float(metrics["loss"])  # host fetch: the only reliable sync on the relay

    t0 = time.perf_counter()
    for _ in range(calls):
        state, metrics = step_fn(state, dbatch)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    return batch * calls * per_call / dt / n_dev


def bench_serve_latency(trials: int = 50):
    """p50 single-image serve latency (target <20 ms, BASELINE.md)."""
    import jax

    from touhouimageclassification_tpu.config import VIT_LARGE
    from touhouimageclassification_tpu.infer.serve import Predictor
    from touhouimageclassification_tpu.models.vit import ViT

    model = ViT(VIT_LARGE)
    params = model.init(jax.random.key(0), np.zeros((1, 224, 224, 3), np.float32))["params"]
    predictor = Predictor(
        model=model, params=params, model_state={},
        class_to_idx={f"c{i}": i for i in range(120)}, image_size=(224, 224),
        mean=np.array([0.485, 0.456, 0.406]), std=np.array([0.229, 0.224, 0.225]),
    )
    img = np.zeros((1, 224, 224, 3), np.uint8)
    predictor.predict_array(img)  # compile
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        predictor.predict_array(img)
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1000)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--steps", type=int, default=24)
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize encoder layers (for batches >192)")
    parser.add_argument("--scan", type=int, default=8,
                        help="optimizer steps fused per jitted call "
                             "(steps_per_call); 1 = one call per step")
    parser.add_argument("--serve", action="store_true",
                        help="also measure p50 serve latency (extra output line)")
    args = parser.parse_args()

    img_s = bench_train(args.batch, args.steps, remat=args.remat, scan=args.scan)
    print(json.dumps({
        "metric": "vit_large_finetune_images_per_sec_per_chip",
        "value": round(img_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s / BASELINE_IMG_PER_SEC, 2),
    }))
    if args.serve:
        p50 = bench_serve_latency()
        print(json.dumps({
            "metric": "serve_latency_p50", "value": round(p50, 2), "unit": "ms",
            "vs_baseline": None,
        }))


if __name__ == "__main__":
    main()
