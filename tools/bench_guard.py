"""Isolate nan-guard + grad-norm + optimizer costs in the train step."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def run(nan_guard, patch_norm, steps=16):
    import jax
    import touhouimageclassification_tpu.train.trainer as T
    from touhouimageclassification_tpu.config import (
        AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig, TrainConfig, VIT_LARGE)
    from touhouimageclassification_tpu.models.vit import ViT
    from touhouimageclassification_tpu.parallel.mesh import create_mesh, data_sharding
    if patch_norm:
        T.fast_global_norm = lambda tree: __import__("jax.numpy", fromlist=["x"]).float32(0.0)
    mesh = create_mesh(num_data=1)
    cfg = TrainConfig(train_id="guard", model_type="vit-large", global_batch_size=128,
                      nan_guard=nan_guard,
                      optimizer=OptimizerConfig(name="adamw", learning_rate=1e-5, weight_decay=0.01),
                      augment=AugmentConfig(), mix=MixConfig(enable_mixup=True),
                      checkpoint=CheckpointConfig(async_save=False), log_dir="/tmp/guard_log")
    trainer = T.Trainer(cfg, model=ViT(VIT_LARGE), mesh=mesh)
    state = trainer.init_state(100)
    step = trainer._make_train_step()
    rng = np.random.default_rng(0)
    b = {"image": rng.integers(0, 256, (128, 256, 256, 3)).astype(np.uint8),
         "label": (np.arange(128) % 120).astype(np.int32),
         "mask": np.ones((128,), bool)}
    db = jax.device_put(b, data_sharding(mesh))
    for _ in range(3):
        state, m = step(state, db)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, db)
    float(m["loss"])
    return 128 * steps / (time.perf_counter() - t0)

if __name__ == "__main__":
    for name, kw in [("guard_on_norm_on", dict(nan_guard=True, patch_norm=False)),
                     ("guard_off_norm_on", dict(nan_guard=False, patch_norm=False)),
                     ("guard_off_norm_off", dict(nan_guard=False, patch_norm=True))]:
        try:
            print(json.dumps({"v": name, "img_s": round(run(**kw), 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"v": name, "error": str(e)[:150]}), flush=True)
