"""Validate timing on the axon relay: wall time must scale with step count."""
import dataclasses, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax
    from touhouimageclassification_tpu.config import (
        AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig, TrainConfig, VIT_LARGE)
    from touhouimageclassification_tpu.models.vit import ViT
    from touhouimageclassification_tpu.parallel.mesh import create_mesh, data_sharding
    from touhouimageclassification_tpu.train.trainer import Trainer
    mesh = create_mesh(num_data=len(jax.devices()))
    cfg = TrainConfig(train_id="slope", model_type="vit-large", global_batch_size=128,
                      optimizer=OptimizerConfig(name="adamw", learning_rate=1e-5, weight_decay=0.01),
                      augment=AugmentConfig(), mix=MixConfig(enable_mixup=True),
                      checkpoint=CheckpointConfig(async_save=False), log_dir="/tmp/slope_log")
    trainer = Trainer(cfg, model=ViT(VIT_LARGE), mesh=mesh)
    state = trainer.init_state(100)
    step_fn = trainer._make_train_step()
    rng = np.random.default_rng(0)
    b = {"image": rng.integers(0, 256, (128, 256, 256, 3)).astype(np.uint8),
         "label": (np.arange(128) % 120).astype(np.int32),
         "mask": np.ones((128,), bool)}
    db = jax.device_put(b, data_sharding(mesh))
    for _ in range(3):
        state, m = step_fn(state, db)
    jax.block_until_ready(m["loss"])
    for steps in (10, 40):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step_fn(state, db)
        # force real materialization: fetch the value to host
        loss = float(m["loss"])
        dt = time.perf_counter() - t0
        print(json.dumps({"steps": steps, "total_s": round(dt, 2),
                          "img_s": round(128 * steps / dt, 1),
                          "loss": round(loss, 4)}), flush=True)

if __name__ == "__main__":
    main()
