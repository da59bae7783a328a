"""Batch inference throughput of the serve/filter judge path.

The reference's ``full_judge`` scores the whole 132k-image dataset batch-1
(``TIC/utils/serve.py:212-213``); this build scores batch-64 through the
jitted bucketed Predictor. Measures the device-side batch-64 forward
(uint8 in -> probabilities out, chained, scalar fetch) for ViT-Base (the
filter judge) and ViT-Large (the eval sweep model).

``--e2e`` measures the REAL ``full_judge`` end-to-end on a Pixiv-scale
JPEG corpus (decode included) three ways: plain decode path, canvas-cache
fill pass, and the warm-cache pass the filter->acc recipe actually repeats.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def e2e(corpus: str):
    import jax

    from bench import _ensure_jpeg_corpus
    from touhouimageclassification_tpu.config import VIT_BASE
    from touhouimageclassification_tpu.infer.serve import Predictor, full_judge
    from touhouimageclassification_tpu.models.vit import ViT

    _ensure_jpeg_corpus(corpus)
    n_img = sum(f.lower().endswith(".jpg")
                for _, _, files in os.walk(corpus) for f in files)
    model = ViT(VIT_BASE)
    params = model.init(
        jax.random.key(0), np.zeros((1, 224, 224, 3), np.float32))["params"]
    predictor = Predictor(
        model=model, params=params, model_state={},
        # must cover every argmax of the 120-way head (labels only match
        # the corpus's first 24 names; accuracy is irrelevant here)
        class_to_idx={f"class_{i:03d}": i for i in range(VIT_BASE.num_classes)},
        image_size=(224, 224),
        mean=np.array([0.485, 0.456, 0.406]),
        std=np.array([0.229, 0.224, 0.225]),
    )

    def run(tag, mode):
        os.sync()  # writeback from a prior fill must not steal the one core
        t0 = time.perf_counter()
        full_judge(predictor, corpus, output=None, progress=False,
                   canvas_cache=mode)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "pass": tag, "images": n_img, "seconds": round(dt, 2),
            "judge_img_s_e2e": round(n_img / dt, 1),
        }), flush=True)

    import shutil
    shutil.rmtree(os.path.join(corpus, ".tic_canvas_cache"), ignore_errors=True)
    run("decode_path", "off")        # every pass decodes at model size
    run("cache_fill", "on")          # decode at canvas size + memmap fill
    run("cache_warm", "auto")        # the repeat judge/filter/acc case


def _fetch(x):
    import jax.numpy as jnp
    return float(np.asarray(jnp.mean(x)))


def main():
    if "--e2e" in sys.argv:
        i = sys.argv.index("--e2e")
        corpus = (sys.argv[i + 1] if len(sys.argv) > i + 1
                  else "/tmp/tic_bench_corpus")
        e2e(corpus)
        return
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
