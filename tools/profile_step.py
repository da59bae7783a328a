"""Capture a jax.profiler trace of the ViT-L train step and summarize ops."""
import glob, json, os, sys
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
    cfg = TrainConfig(train_id="prof", model_type="vit-large", global_batch_size=128,
                      optimizer=OptimizerConfig(name="adamw", learning_rate=1e-5, weight_decay=0.01),
                      augment=AugmentConfig(), mix=MixConfig(enable_mixup=True),
                      checkpoint=CheckpointConfig(async_save=False), log_dir="/tmp/prof_log")
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
    float(m["loss"])
    logdir = "/tmp/tic_trace"
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        state, m = step_fn(state, db)
    float(m["loss"])
    jax.profiler.stop_trace()
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    print(json.dumps({"xplane_files": files}), flush=True)

if __name__ == "__main__":
    main()
