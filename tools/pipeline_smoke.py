"""Full reproduction-recipe smoke: every pipeline stage composed end-to-end.

Mirrors the reference README's recipe (README.md:48-73) on a synthetic
fixture dataset with tiny models, exercising:

  1. finetune the filter-judge ViT on 'unfiltered' data (train.finetune)
  2. export it for serving (--transform / export_for_serving)
  3. self-filter the dataset with it (infer.filter --model)
  4. train the main model on the filtered data (train.ntrain --preset nvit)
  5. evaluate via the accuracy sweep (analysis.acc.run_sweep)
  6. serve a single image (infer.serve)

Run on CPU: JAX_PLATFORMS=cpu python tools/pipeline_smoke.py

Env knobs:
- TIC_SMOKE_TINY=1     smaller fixture + fewer epochs (the CI-default mode,
                       ~2 min on one CPU core; see tests/test_pipeline_smoke.py)
- TIC_SMOKE_FORCE_CPU=1 force the CPU backend even when the default backend
                       is a (possibly tunneled) TPU — CI must not depend on
                       chip availability or remote-compile latency
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TINY = os.environ.get("TIC_SMOKE_TINY") == "1"


def make_fixture(root, num_classes=3, per_class=14, test_per_class=6,
                 size=40, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    colors = rng.integers(40, 216, size=(num_classes, 3))
    names = [f"char_{c:02d}" for c in range(num_classes)]
    for split, n in (("unfiltered", per_class), ("testset", test_per_class)):
        for ci, name in enumerate(names):
            d = os.path.join(root, split, name)
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                noise = rng.normal(0, 25, (size, size, 3))
                img = np.clip(colors[ci] + noise, 0, 255).astype(np.uint8)
                Image.fromarray(img).save(os.path.join(d, f"{i}.jpg"), quality=90)
    return os.path.join(root, "unfiltered"), os.path.join(root, "testset")


def main():
    import jax

    if (os.environ.get("TIC_SMOKE_FORCE_CPU") == "1"
            or jax.default_backend() not in ("tpu", "axon")):
        jax.config.update("jax_platforms", "cpu")

    work = os.path.abspath(os.environ.get("SMOKE_DIR", "/tmp/tic_pipeline_smoke"))
    shutil.rmtree(work, ignore_errors=True)
    if TINY:
        unfiltered, testset = make_fixture(work, per_class=8, test_per_class=4,
                                           size=32)
    else:
        unfiltered, testset = make_fixture(work)
    ckpt_dir = os.path.join(work, "checkpoint")
    log_dir = os.path.join(work, "log")
    os.environ["TIC_CHECKPOINT_DIR"] = ckpt_dir
    os.environ["TIC_LOG_DIR"] = log_dir
    os.environ["TIC_TEST_DIR"] = testset

    # config module caches env at import; set before importing the package
    import touhouimageclassification_tpu.config as C
    C.CHECKPOINT_DIR = ckpt_dir
    C.LOG_DIR = log_dir
    C.TEST_DIR = testset

    from touhouimageclassification_tpu.train import finetune, ntrain

    # reload PRESETS against the patched dirs: presets captured old paths, so
    # pass explicit --data-dir everywhere and checkpoint dirs via env only
    import dataclasses
    import touhouimageclassification_tpu.train.cli as cli

    judge_epochs = "2" if TINY else "4"
    main_epochs = "4" if TINY else "6"

    print("=== 1) finetune the filter judge ===")
    finetune.main(["--tiny", "--no-pretrained", "--data-dir", unfiltered,
                   "--max-epochs", judge_epochs, "--batch-size", "8",
                   "--no-resume", "--lr", "3e-3", "--schedule", "constant"])

    print("=== 2) export the judge for serving ===")
    judge_dir = os.path.join(work, "serving", "judge")
    finetune.main(["--tiny", "--no-pretrained", "--data-dir", unfiltered,
                   "--transform", judge_dir])

    print("=== 3) self-filter the dataset ===")
    from touhouimageclassification_tpu.infer import serve as S
    from touhouimageclassification_tpu.infer.filter import filter as filter_csv
    from touhouimageclassification_tpu.infer.serve import full_judge

    predictor = S.init(modelt="vit-base", weights=judge_dir, data_dir=unfiltered)
    judge_csv = os.path.join(work, "judge.csv")
    acc_unfiltered = full_judge(predictor, unfiltered, judge_csv, progress=False)
    filtered = os.path.join(work, "data_filtered")
    tot, kept = filter_csv(judge_csv, filtered)
    print(f"judge acc on train data: {acc_unfiltered:.2f}; kept {kept}/{tot}")
    assert kept > 0, "filter kept nothing"

    print("=== 4) main training on filtered data ===")
    ntrain.main(["--preset", "nvit", "--tiny", "--no-pretrained",
                 "--data-dir", filtered, "--max-epochs", main_epochs,
                 "--batch-size", "8", "--no-resume", "--lr", "3e-3"])
    main_dir = os.path.join(work, "serving", "nvit")
    ntrain.main(["--preset", "nvit", "--tiny", "--no-pretrained",
                 "--data-dir", filtered, "--transform", main_dir])

    print("=== 5) accuracy sweep ===")
    from touhouimageclassification_tpu.analysis.acc import run_sweep

    result_dir = os.path.join(work, "result")
    rows = run_sweep(models=[("judge", "vit-base", judge_dir),
                             ("nvit_main", "vit-base", main_dir)],
                     test_dir=testset, result_dir=result_dir,
                     data_dir=filtered)
    print(json.dumps(rows))
    accs = {r["name"]: r["acc"] for r in rows}
    assert accs["nvit_main"] > 1.0 / 3, f"main model at chance: {accs}"

    print("=== 6) serve one image ===")
    from PIL import Image

    p2 = S.init(modelt="vit-base", weights=main_dir, data_dir=filtered)
    sample = next(
        os.path.join(r, f) for r, _d, fs in os.walk(testset) for f in fs
        if f.endswith(".jpg")
    )
    with Image.open(sample) as im:
        name, conf = S.serve(p2, im)
    print(f"serve({os.path.basename(sample)}) -> {name} ({conf:.2%})")

    print("PIPELINE SMOKE: OK", json.dumps(accs))


if __name__ == "__main__":
    main()
