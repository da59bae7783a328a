"""Batch inference throughput of the serve/filter judge path.

The reference's ``full_judge`` scores the whole 132k-image dataset batch-1
(``TIC/utils/serve.py:212-213``); this build scores batch-64 through the
jitted bucketed Predictor. Measures the device-side batch-64 forward
(uint8 in -> probabilities out, chained, scalar fetch) for ViT-Base (the
filter judge) and ViT-Large (the eval sweep model).
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fetch(x):
    import jax.numpy as jnp
    return float(np.asarray(jnp.mean(x)))


def main():
    import jax, jax.numpy as jnp

    from touhouimageclassification_tpu.config import VIT_BASE, VIT_LARGE
    from touhouimageclassification_tpu.infer.serve import Predictor
    from touhouimageclassification_tpu.models.vit import ViT

    B, REPS = 64, 16
    for name, cfg in (("vit-base", VIT_BASE), ("vit-large", VIT_LARGE)):
        model = ViT(cfg)
        params = model.init(
            jax.random.key(0), np.zeros((1, 224, 224, 3), np.float32)
        )["params"]
        predictor = Predictor(
            model=model, params=params, model_state={},
            class_to_idx={f"c{i}": i for i in range(120)},
            image_size=(224, 224),
            mean=np.array([0.485, 0.456, 0.406]),
            std=np.array([0.229, 0.224, 0.225]),
        )

        @jax.jit
        def chained(params, img):
            def body(_, img):
                out = predictor._predict(params, {}, img)   # (2, B)
                # data-dependence so the relay cannot collapse the chain
                preds = out[0].astype(jnp.uint8)[:, None, None, None]
                return (img + preds) % 255
            img = jax.lax.fori_loop(0, REPS, body, img)
            return jnp.mean(predictor._predict(params, {}, img))

        rng = np.random.default_rng(0)
        mk = lambda: jnp.asarray(
            rng.integers(0, 256, (B, 224, 224, 3)).astype(np.uint8))
        dev_params = predictor._params
        _fetch(chained(dev_params, mk()))  # compile
        best = float("inf")
        for _ in range(3):
            img = mk()
            _fetch(img)
            t0 = time.perf_counter()
            _fetch(chained(dev_params, img))
            best = min(best, (time.perf_counter() - t0) / (REPS + 1))
        print(json.dumps({
            "model": name, "batch": B,
            "judge_ms_per_batch": round(best * 1000, 2),
            "judge_img_s_device": round(B / best, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
