"""ResNet-152 BatchNorm-variant A/B on the full train step (VERDICT r3 #2).

Round-3 closed the ResNet perf axis by roofline argument: BN batch-stats
passes = 27% of forward (tools/roofline_resnet.py), early stages at their
HBM floors, 911 img/s = 73-83% of a ~1,100-1,250 ceiling. This runs the
one experiment that argument skipped — actually trying cheaper BN
statistics on the REAL train step (batch 80, 256², SGD preset):

  flax   nn.BatchNorm (shipped default)                — the baseline
  batch  hand-rolled parity module (ops/batchnorm.py)  — prices the swap
  ghost  stats from B/4 rows (1/4 the stats-read traffic)
  stale  normalize by EMA stats (no reduce->normalize serialization)

Protocol (CLAUDE.md): single-variable, back-to-back, interleaved passes
(3 process-level passes x 4 variants), chained steps, scalar fetch.

Run (chip): python tools/bench_bn.py [batch] [steps]
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = ("flax", "batch", "ghost", "stale")


def main():
    import dataclasses

    import jax

    from touhouimageclassification_tpu.config import PRESETS, ResNetConfig
    from touhouimageclassification_tpu.models.resnet import ResNet
    from touhouimageclassification_tpu.parallel.mesh import (
        create_mesh, data_sharding,
    )
    from touhouimageclassification_tpu.train.trainer import Trainer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    n_dev = len(jax.devices())
    mesh = create_mesh(num_data=n_dev)
    rng = np.random.default_rng(0)
    b = {
        "image": rng.integers(0, 256, (batch, 256, 256, 3)).astype(np.uint8),
        "label": (np.arange(batch) % 120).astype(np.int32),
        "mask": np.ones((batch,), bool),
    }
    db = jax.device_put(b, data_sharding(mesh))

    runs = {}
    for v in VARIANTS:
        cfg = dataclasses.replace(
            PRESETS["resnet152"], train_id=f"bench_bn_{v}",
            global_batch_size=batch, log_dir="/tmp/tic_bench_bn_log",
        )
        model = ResNet(ResNetConfig(depth=152, num_classes=120, bn_variant=v))
        trainer = Trainer(cfg, model=model, mesh=mesh)
        state = trainer.init_state(steps_per_epoch=100)
        step_fn = trainer._make_train_step()
        for _ in range(2):
            state, metrics = step_fn(state, db)   # compile + warm
        float(metrics["loss"])
        runs[v] = (step_fn, state)

    rates = {v: [] for v in VARIANTS}
    for p in range(passes):
        for v in VARIANTS:
            step_fn, state = runs[v]
            # the train step donates its state buffers: always rebind
            state, m0 = step_fn(state, db)
            float(m0["loss"])                     # sync before timing
            t0 = time.perf_counter()
            for _ in range(steps):
                state, metrics = step_fn(state, db)
            float(metrics["loss"])                # host fetch = real sync
            rates[v].append(batch * steps / (time.perf_counter() - t0) / n_dev)
            runs[v] = (step_fn, state)

    out = {v: {"img_s_per_chip": round(max(r), 1),
               "all_passes": [round(x, 1) for x in r]}
           for v, r in rates.items()}
    base = out["flax"]["img_s_per_chip"]
    for v in VARIANTS:
        out[v]["vs_flax"] = round(out[v]["img_s_per_chip"] / base, 3)
    print(json.dumps({"batch": batch, "steps": steps, "passes": passes,
                      "variants": out}, indent=1), flush=True)


if __name__ == "__main__":
    main()
