"""Step-level A/B of the NaN-guard / grad-norm machinery (round-3 ledger's
one unexplored perf residual, ~3-4% in round-1 trace-level measurements).

Variants of the global-norm computed inside the train step
(train/optim.py::fast_global_norm, selected via TIC_GRAD_NORM_IMPL at
trace time):

- concat   : shipped — flatten+concat (extra ~1.2 GB copy) + one big reduce
- leafsum  : per-leaf sum(x^2) + scalar add chain (minimal traffic,
             ~300 small reduces)
- off      : norm == 0.0, guard degrades to isfinite(loss) — the FLOOR;
             not a shippable config (loses the grad-finiteness check and
             the grad_norm metric), included to bound what the guard costs.

Measurement per CLAUDE.md relay rules: the real train step (bench.py's
configuration, batch 192, scan=8), state chained across calls, ONE scalar
fetch per window, interleaved A/B/C rounds back-to-back, min-time across
rounds. Single-variable: the three step functions differ only in the norm.

One variant per process: ViT-L params (1.2 GB f32) + AdamW moments (2.4 GB)
per trainer state mean three resident variants exhaust the 16 GB chip
(measured: RESOURCE_EXHAUSTED) — so interleave at the PROCESS level:

  for p in 1 2 3; do for v in concat leafsum off; do
      python tools/bench_guard.py --variant $v; done; done

and take the max img/s per variant (min-time estimator; the persistent
compile cache makes every pass after the first warm).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ("concat", "leafsum", "off")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=192)
    parser.add_argument("--steps", type=int, default=24)
    parser.add_argument("--scan", type=int, default=8)
    parser.add_argument("--rounds", type=int, default=3,
                        help="timed windows within this process (best-of)")
    parser.add_argument("--variant", type=str, default="concat",
                        choices=VARIANTS)
    args = parser.parse_args()

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from touhouimageclassification_tpu.config import (
        AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig,
        TrainConfig, VIT_LARGE,
    )
    from touhouimageclassification_tpu.models.vit import ViT
    from touhouimageclassification_tpu.parallel.mesh import create_mesh
    from touhouimageclassification_tpu.train.trainer import Trainer

    n_dev = len(jax.devices())
    mesh = create_mesh(num_data=n_dev)
    cfg = TrainConfig(
        train_id="bench_guard",
        model_type="vit-large",
        global_batch_size=args.batch,
        optimizer=OptimizerConfig(name="adamw", learning_rate=1e-5,
                                  weight_decay=0.01),
        augment=AugmentConfig(),
        mix=MixConfig(enable_mixup=True),
        checkpoint=CheckpointConfig(async_save=False),
        log_dir="/tmp/tic_bench_log",
        steps_per_call=args.scan,
    )

    rng = np.random.default_rng(0)
    stacked = {
        "image": rng.integers(0, 256, (args.scan, args.batch, 256, 256, 3),
                              dtype=np.int64).astype(np.uint8),
        "label": np.tile(np.arange(args.batch) % 120,
                         (args.scan, 1)).astype(np.int32),
        "mask": np.ones((args.scan, args.batch), bool),
    }
    dbatch = jax.device_put(stacked, NamedSharding(mesh, P(None, "data")))

    # env var is read at TRACE time (first call of the jitted step)
    v = args.variant
    trainer = Trainer(cfg, model=ViT(VIT_LARGE), mesh=mesh)
    state = trainer.init_state(steps_per_epoch=100)
    step_fn = trainer._make_train_scan(args.scan)
    os.environ["TIC_GRAD_NORM_IMPL"] = v
    t0 = time.perf_counter()
    state, metrics = step_fn(state, dbatch)  # trace+compile here
    float(metrics["loss"])
    print(f"# {v}: compiled+warm in {time.perf_counter() - t0:.1f}s",
          flush=True)

    calls = max(1, args.steps // args.scan)
    best = float("inf")
    for r in range(args.rounds):
        t0 = time.perf_counter()
        for _ in range(calls):
            state, metrics = step_fn(state, dbatch)
        float(metrics["loss"])  # the only reliable sync on the relay
        dt = time.perf_counter() - t0
        best = min(best, dt)
        rate = args.batch * calls * args.scan / dt / n_dev
        print(f"# window {r} {v}: {rate:.1f} img/s", flush=True)

    print(json.dumps({
        "variant": v,
        "img_s": round(args.batch * calls * args.scan / best / n_dev, 2),
        "unit": "img/s/chip",
        "note": ("off = floor (guard on loss only, no grad_norm metric); "
                 "shippable candidates are concat/leafsum"),
    }))


if __name__ == "__main__":
    main()
