"""Throughput sweep for the ViT-L train step on the local chip."""
import dataclasses, json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def run_one(batch, attention_impl, remat, steps=12, warmup=3):
    import jax
    from touhouimageclassification_tpu.config import (
        AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig, TrainConfig, VIT_LARGE)
    from touhouimageclassification_tpu.models.vit import ViT
    from touhouimageclassification_tpu.parallel.mesh import create_mesh, data_sharding
    from touhouimageclassification_tpu.train.trainer import Trainer

    mesh = create_mesh(num_data=len(jax.devices()))
    cfg = TrainConfig(train_id="sweep", model_type="vit-large",
                      global_batch_size=batch,
                      optimizer=OptimizerConfig(name="adamw", learning_rate=1e-5, weight_decay=0.01),
                      augment=AugmentConfig(), mix=MixConfig(enable_mixup=True),
                      checkpoint=CheckpointConfig(async_save=False), log_dir="/tmp/sweep_log")
    vcfg = dataclasses.replace(VIT_LARGE, remat=remat, attention_impl=attention_impl)
    trainer = Trainer(cfg, model=ViT(vcfg), mesh=mesh)
    state = trainer.init_state(100)
    step_fn = trainer._make_train_step()
    rng = np.random.default_rng(0)
    b = {"image": rng.integers(0, 256, (batch, 256, 256, 3)).astype(np.uint8),
         "label": (np.arange(batch) % 120).astype(np.int32),
         "mask": np.ones((batch,), bool)}
    db = jax.device_put(b, data_sharding(mesh))
    t_c0 = time.perf_counter()
    for _ in range(warmup):
        state, m = step_fn(state, db)
    jax.block_until_ready(m["loss"]); compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, db)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    return batch * steps / dt, compile_s

if __name__ == "__main__":
    import sys
    import sys
    combos = [
        (128, "flash", False),
    ]
    for batch, attn, remat in combos:
        try:
            ips, cs = run_one(batch, attn, remat)
            print(json.dumps({"batch": batch, "attn": attn, "remat": remat,
                              "img_s": round(ips, 1), "compile_s": round(cs, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"batch": batch, "attn": attn, "remat": remat,
                              "error": str(e)[:200]}), flush=True)
