"""Isolate step-time contributors: augmentation, mixup, model fwd/bwd."""
import dataclasses, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def run(batch, aug_on, mix_on, remat=False, steps=12, warmup=3, canvas=256):
    import jax
    from touhouimageclassification_tpu.config import (
        AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig, TrainConfig, VIT_LARGE)
    from touhouimageclassification_tpu.models.vit import ViT
    from touhouimageclassification_tpu.parallel.mesh import create_mesh, data_sharding
    from touhouimageclassification_tpu.train.trainer import Trainer
    mesh = create_mesh(num_data=len(jax.devices()))
    cfg = TrainConfig(train_id="parts", model_type="vit-large",
                      global_batch_size=batch,
                      optimizer=OptimizerConfig(name="adamw", learning_rate=1e-5, weight_decay=0.01),
                      augment=AugmentConfig() if aug_on else AugmentConfig(enable_augmentation=False),
                      mix=MixConfig(enable_mixup=mix_on),
                      checkpoint=CheckpointConfig(async_save=False), log_dir="/tmp/parts_log")
    vcfg = dataclasses.replace(VIT_LARGE, remat=remat)
    trainer = Trainer(cfg, model=ViT(vcfg), mesh=mesh)
    state = trainer.init_state(100)
    step_fn = trainer._make_train_step()
    rng = np.random.default_rng(0)
    b = {"image": rng.integers(0, 256, (batch, canvas, canvas, 3)).astype(np.uint8),
         "label": (np.arange(batch) % 120).astype(np.int32),
         "mask": np.ones((batch,), bool)}
    db = jax.device_put(b, data_sharding(mesh))
    for _ in range(warmup):
        state, m = step_fn(state, db)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, db)
    float(m["loss"])
    return batch * steps / (time.perf_counter() - t0)

if __name__ == "__main__":
    for name, kw in [
        ("full_aug_mix_b128", dict(batch=128, aug_on=True, mix_on=True)),
        ("noaug_nomix_b128", dict(batch=128, aug_on=False, mix_on=False, canvas=224)),
        ("aug_nomix_b128", dict(batch=128, aug_on=True, mix_on=False)),
        ("noaug_nomix_b192", dict(batch=192, aug_on=False, mix_on=False, canvas=224)),
        ("full_b192", dict(batch=192, aug_on=True, mix_on=True)),
        ("full_b256_remat", dict(batch=256, aug_on=True, mix_on=True, remat=True)),
    ]:
        try:
            ips = run(**kw)
            print(json.dumps({"config": name, "img_s": round(ips, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"config": name, "error": str(e)[:150]}), flush=True)
