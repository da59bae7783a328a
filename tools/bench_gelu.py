"""Train-step throughput: exact vs tanh GELU."""
import dataclasses, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def run(gelu, steps=16):
    import jax
    from touhouimageclassification_tpu.config import (
        AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig, TrainConfig, VIT_LARGE)
    from touhouimageclassification_tpu.models.vit import ViT
    from touhouimageclassification_tpu.parallel.mesh import create_mesh, data_sharding
    from touhouimageclassification_tpu.train.trainer import Trainer
    mesh = create_mesh(num_data=1)
    cfg = TrainConfig(train_id="gelu", model_type="vit-large", global_batch_size=128,
                      optimizer=OptimizerConfig(name="adamw", learning_rate=1e-5, weight_decay=0.01),
                      augment=AugmentConfig(), mix=MixConfig(enable_mixup=True),
                      checkpoint=CheckpointConfig(async_save=False), log_dir="/tmp/gelu_log")
    model = ViT(dataclasses.replace(VIT_LARGE, gelu=gelu))
    trainer = Trainer(cfg, model=model, mesh=mesh)
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
    for g in sys.argv[1:] or ("exact", "fast", "poly", "tanh"):
        print(json.dumps({"gelu": g, "img_s": round(run(g), 1)}), flush=True)
