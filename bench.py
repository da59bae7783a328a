"""Headline benchmark: ViT-Large finetune throughput (images/sec/chip).

Runs the REAL training step — on-device full augmentation recipe +
CutMix/MixUp + bf16 forward/backward + AdamW update, exactly the main-result
configuration (``TIC/ViT/ntrain.py:250-267``) — on synthetic data on the
local TPU chip, and prints one JSON line.

Baseline: the reference reports ~67 img/s for ViT-Large finetune at batch 30
fp16 on an RTX 3080 (report.pdf p.8 §4.3; BASELINE.md).

Usage: python bench.py [--batch 128] [--steps 20] [--serve]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_IMG_PER_SEC = 67.0  # RTX 3080 reference point (BASELINE.md)


def bench_train(batch: int, steps: int, warmup: int = 2, remat: bool = False,
                scan: int = 8, attn: str | None = None,
                gelu: str | None = None, model: str = "vit-large") -> float:
    import jax

    from touhouimageclassification_tpu.config import (
        AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig, TrainConfig,
        VIT_BASE, VIT_LARGE,
    )
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from touhouimageclassification_tpu.models.vit import ViT
    from touhouimageclassification_tpu.parallel.mesh import create_mesh, data_sharding
    from touhouimageclassification_tpu.train.trainer import Trainer

    n_dev = len(jax.devices())
    mesh = create_mesh(num_data=n_dev)
    base_cfg = VIT_BASE if model == "vit-base" else VIT_LARGE
    cfg = TrainConfig(
        train_id="bench",
        model_type=model,
        global_batch_size=batch,
        optimizer=OptimizerConfig(name="adamw", learning_rate=1e-5, weight_decay=0.01),
        augment=AugmentConfig(),
        mix=MixConfig(enable_mixup=True),
        checkpoint=CheckpointConfig(async_save=False),
        log_dir="/tmp/tic_bench_log",
        steps_per_call=scan,
    )
    # sweep result (tools/bench_sweep.py): batch 128 fits without remat on a
    # 16 GB v5e and runs ~20% faster than the rematerialized step
    overrides = {"remat": remat}
    if attn:
        overrides["attention_impl"] = attn
    if gelu:
        overrides["gelu"] = gelu
    vit = ViT(dataclasses.replace(base_cfg, **overrides))
    trainer = Trainer(cfg, model=vit, mesh=mesh)
    state = trainer.init_state(steps_per_epoch=100)

    rng = np.random.default_rng(0)
    def batch_np(seed):
        r = np.random.default_rng(seed)
        return {
            "image": r.integers(0, 256, (batch, 256, 256, 3)).astype(np.uint8),
            "label": (np.arange(batch) % 120).astype(np.int32),
            "mask": np.ones((batch,), bool),
        }

    if scan > 1:
        # k fused optimizer steps per call (TrainConfig.steps_per_call — the
        # trainer's production fast path)
        step_fn = trainer._make_train_scan(scan)
        # generate each ~38 MB synthetic batch ONCE, then stack per key (a
        # per-key comprehension would regenerate all of them 3x on this
        # single host core)
        bs = [batch_np(s) for s in range(scan)]
        stacked = {
            key: np.stack([b[key] for b in bs])
            for key in ("image", "label", "mask")
        }
        dbatch = jax.device_put(stacked, NamedSharding(mesh, P(None, "data")))
        per_call = scan
    else:
        step_fn = trainer._make_train_step()
        dbatch = jax.device_put(batch_np(0), data_sharding(mesh))
        per_call = 1

    calls = max(1, steps // per_call)
    for _ in range(warmup):
        state, metrics = step_fn(state, dbatch)
    float(metrics["loss"])  # host fetch: the only reliable sync on the relay

    # best of two timed windows: the shared relay's load moves single-window
    # readings by ±5% (measured 305-321 img/s for identical executables);
    # min-time is the standard estimator for steady-state throughput
    best_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(calls):
            state, metrics = step_fn(state, dbatch)
        float(metrics["loss"])
        best_dt = min(best_dt, time.perf_counter() - t0)
    return batch * calls * per_call / best_dt / n_dev


def _ensure_jpeg_corpus(root: str, classes: int = 24, per_class: int = 48,
                        size: tuple[int, int] = (900, 1200)) -> str:
    """Pixiv-scale JPEG corpus (~1200x900, quality 90) for the input-pipeline
    bench: smooth gradients + random rectangles so files compress/decode like
    natural artwork rather than incompressible noise."""
    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        return root
    from PIL import Image

    h, w = size
    yy, xx = np.mgrid[0:h, 0:w]
    rng = np.random.default_rng(0)
    for c in range(classes):
        cdir = os.path.join(root, f"class_{c:03d}")
        os.makedirs(cdir, exist_ok=True)
        base = rng.integers(0, 200, 3)
        for i in range(per_class):
            img = np.empty((h, w, 3), np.uint8)
            for ch in range(3):
                grad = (base[ch] + 55 * np.sin(xx / (40 + 7 * ch) + i)
                        + 40 * np.cos(yy / (60 + 5 * ch)))
                img[..., ch] = np.clip(grad, 0, 255)
            for _ in range(6):  # detail blobs so JPEG blocks aren't trivial
                y0, x0 = rng.integers(0, h - 120), rng.integers(0, w - 120)
                img[y0:y0 + 120, x0:x0 + 120] ^= rng.integers(
                    0, 256, (120, 120, 3)).astype(np.uint8) // 3
            Image.fromarray(img).save(os.path.join(cdir, f"{i}.jpg"), quality=90)
    open(marker, "w").close()
    return root


def bench_train_real(batch: int, steps: int, corpus_dir: str,
                     warmup: int = 2) -> tuple[float, float, float]:
    """Steady-state img/s of the FULL pipeline: host JPEG decode (native
    C++ decoder when built, else PIL-draft) -> prefetch queue -> device_put
    double buffering -> the real train step. Returns (train_img_s_cached,
    host_only_img_s_decode, host_only_img_s_cached). VERDICT r1 weak #2:
    quantifies decode-bound vs canvas-cached epochs (this box has ONE host
    core; decode tops out ~127 img/s/core, so epochs >= 2 ride the cache)."""
    import jax

    from touhouimageclassification_tpu.config import (
        AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig, TrainConfig,
        VIT_LARGE,
    )
    from touhouimageclassification_tpu.data.folder import scan_image_folder
    from touhouimageclassification_tpu.data.loader import (
        HostImageLoader, device_put_iterator,
    )
    from touhouimageclassification_tpu.models.vit import ViT
    from touhouimageclassification_tpu.parallel.mesh import create_mesh, data_sharding
    from touhouimageclassification_tpu.train.trainer import Trainer

    _ensure_jpeg_corpus(corpus_dir)
    index = scan_image_folder(corpus_dir, persist_class_map=False)

    def make_loader(cache=True):
        return HostImageLoader(
            index, batch_size=batch, canvas=(256, 256), shuffle=True,
            loop=True, prefetch_batches=4, canvas_cache=cache,
        )

    # host-only decode rate, cold. The window must not exceed ONE epoch of
    # the corpus: past that every batch is a cache hit (the cache fills as
    # epoch 1 iterates) and the "decode" rate silently measures memmap
    # reads instead (observed 3-4x inflation at batch 192 x 24 steps on the
    # 1152-image corpus).
    import shutil

    shutil.rmtree(os.path.join(corpus_dir, ".tic_canvas_cache"),
                  ignore_errors=True)
    cold_steps = max(1, min(steps, len(index) // batch))
    it = iter(make_loader())
    t0 = time.perf_counter()
    for _ in range(cold_steps):
        next(it)
    host_decode_rate = batch * cold_steps / (time.perf_counter() - t0)
    # fill the rest of the cache, then measure the cached host rate
    for _ in range(len(index) // batch + 1):
        next(it)
    it = iter(make_loader())
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(steps):
        next(it)
    host_cached_rate = batch * steps / (time.perf_counter() - t0)

    n_dev = len(jax.devices())
    mesh = create_mesh(num_data=n_dev)
    cfg = TrainConfig(
        train_id="bench_real",
        model_type="vit-large",
        global_batch_size=batch,
        optimizer=OptimizerConfig(name="adamw", learning_rate=1e-5, weight_decay=0.01),
        augment=AugmentConfig(),
        mix=MixConfig(enable_mixup=True),
        checkpoint=CheckpointConfig(async_save=False),
        log_dir="/tmp/tic_bench_log",
    )
    trainer = Trainer(cfg, model=ViT(VIT_LARGE), mesh=mesh)
    state = trainer.init_state(steps_per_epoch=100)
    step_fn = trainer._make_train_step()
    dev_it = device_put_iterator(iter(make_loader()), data_sharding(mesh))
    # settle: the cache refill above just dirtied ~hundreds of MB of memmap
    # pages; on this one-core host the kernel's writeback steals the CPU
    # from the loader thread mid-measurement (observed 167-286 img/s spread
    # on identical code). Flush first, then best-of-2 windows.
    os.sync()
    for _ in range(warmup):
        state, metrics = step_fn(state, next(dev_it))
    float(metrics["loss"])  # sync
    best_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step_fn(state, next(dev_it))
        float(metrics["loss"])
        best_dt = min(best_dt, time.perf_counter() - t0)
    train_rate = batch * steps / best_dt / n_dev
    return train_rate, host_decode_rate, host_cached_rate


def bench_serve_latency(trials: int = 50, chain_reps: int = 32):
    """Single-image serve latency.

    Returns (p50_ms, device_ms): p50 over ``trials`` end-to-end predicts with
    a DIFFERENT image every trial (identical (executable, inputs) pairs are
    memoized by the axon relay — CLAUDE.md measurement rules), plus a
    measured on-device inference time from ``chain_reps`` chained predicts
    inside one jitted program (amortizes the tunnel RTT away), so the
    p50 = device + round-trip split is substantiated, not asserted.
    """
    import jax
    import jax.numpy as jnp

    from touhouimageclassification_tpu.config import VIT_LARGE
    from touhouimageclassification_tpu.infer.serve import Predictor
    from touhouimageclassification_tpu.models.vit import ViT

    model = ViT(VIT_LARGE)
    params = model.init(jax.random.key(0), np.zeros((1, 224, 224, 3), np.float32))["params"]
    predictor = Predictor(
        model=model, params=params, model_state={},
        class_to_idx={f"c{i}": i for i in range(120)}, image_size=(224, 224),
        mean=np.array([0.485, 0.456, 0.406]), std=np.array([0.229, 0.224, 0.225]),
    )
    rng = np.random.default_rng(0)

    def fresh_img():
        return rng.integers(0, 256, (1, 224, 224, 3)).astype(np.uint8)

    for _ in range(3):  # compile + stabilize with distinct inputs
        predictor.predict_array(fresh_img())
    times = []
    for _ in range(trials):
        img = fresh_img()
        t0 = time.perf_counter()
        predictor.predict_array(img)
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times) * 1000)

    # device-only time: chain inferences so only ONE dispatch+fetch spans all
    @jax.jit
    def chained(params, img):
        def body(_, img):
            out = predictor._predict(params, {}, img)
            return (img + out[0, 0].astype(jnp.uint8)) % 255
        return predictor._predict(params, {}, jax.lax.fori_loop(0, chain_reps, body, img))

    dev_params = predictor._params
    img = jnp.asarray(fresh_img())
    np.asarray(chained(dev_params, img))  # compile
    t0 = time.perf_counter()
    np.asarray(chained(dev_params, jnp.asarray(fresh_img())))
    total = time.perf_counter() - t0
    # subtract one e2e call's host overhead share: the chained call still
    # pays one RTT; per-inference device time is the slope
    t1 = time.perf_counter()
    np.asarray(predictor._predict(dev_params, {}, jnp.asarray(fresh_img())))
    one = time.perf_counter() - t1
    device_ms = max(0.0, (total - one) / chain_reps * 1000)
    return p50, device_ms


def main():
    parser = argparse.ArgumentParser()
    # batch 192 beats 128 by ~1% with the slab-attention stack (332.3 vs
    # 329.1 img/s, reproduced twice each); 256 needs remat and loses
    parser.add_argument("--batch", type=int, default=192)
    parser.add_argument("--steps", type=int, default=24)
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize encoder layers (for batches >192)")
    parser.add_argument("--scan", type=int, default=8,
                        help="optimizer steps fused per jitted call "
                             "(steps_per_call); 1 = one call per step")
    parser.add_argument("--serve", action="store_true",
                        help="also measure p50 serve latency (extra output line)")
    parser.add_argument("--attn", type=str, default=None,
                        choices=["xla", "fused", "flash", "xla_remat"],
                        help="attention impl override for the train bench")
    parser.add_argument("--gelu", type=str, default=None,
                        choices=["exact", "fast", "poly", "tanh"],
                        help="GELU variant override for the train bench")
    parser.add_argument("--model", type=str, default="vit-large",
                        choices=["vit-large", "vit-base"],
                        help="train-bench model (vit-base = the filter judge)")
    parser.add_argument("--real-data", action="store_true",
                        help="also run the end-to-end input-pipeline bench "
                             "(host JPEG decode -> prefetch -> train step)")
    parser.add_argument("--corpus-dir", type=str, default="/tmp/tic_bench_corpus")
    parser.add_argument("--init-timeout", type=int, default=900,
                        help="seconds to wait for the TPU backend before "
                             "failing loudly (the tunneled axon client "
                             "blocks forever when the relay is down)")
    args = parser.parse_args()

    # Backend watchdog: jax's PJRT client connect has no timeout of its own;
    # when the relay is unreachable the process would hang silently forever.
    # Fail with a diagnosable message instead.
    import threading

    backend_up = threading.Event()

    def _watchdog():
        if not backend_up.wait(args.init_timeout):
            print(json.dumps({
                "metric": "error", "value": 0, "unit": "",
                "vs_baseline": 0,
                "error": f"TPU backend did not initialize within "
                         f"{args.init_timeout}s (relay down?)",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax

    n = len(jax.devices())
    backend_up.set()
    print(f"# backend up: {jax.default_backend()} x{n}", file=sys.stderr,
          flush=True)

    if args.real_data:
        ignored = [f for f, dflt in (("--model", args.model == "vit-large"),
                                     ("--remat", not args.remat),
                                     ("--scan", args.scan == 8),
                                     ("--attn", args.attn is None),
                                     ("--gelu", args.gelu is None),
                                     ("--serve", not args.serve)) if not dflt]
        if ignored:
            print(f"# note: --real-data uses the production ViT-L config; "
                  f"ignoring {', '.join(ignored)}", file=sys.stderr)
        train_rate, host_decode, host_cached = bench_train_real(
            args.batch, args.steps, args.corpus_dir
        )
        print(json.dumps({
            "metric": "vit_large_finetune_images_per_sec_real_data",
            "value": round(train_rate, 2), "unit": "img/s/chip",
            "vs_baseline": round(train_rate / BASELINE_IMG_PER_SEC, 2),
            "host_decode_img_s": round(host_decode, 2),
            "host_cached_img_s": round(host_cached, 2),
        }))
        return

    img_s = bench_train(args.batch, args.steps, remat=args.remat, scan=args.scan,
                        attn=args.attn, gelu=args.gelu, model=args.model)
    print(json.dumps({
        "metric": f"{args.model.replace('-', '_')}_finetune_images_per_sec_per_chip",
        "value": round(img_s, 2),
        "unit": "img/s/chip",
        # the 67 img/s reference point is the ViT-Large epoch time; no
        # ViT-Base throughput is published, so the ratio only means
        # something for the flagship
        "vs_baseline": (round(img_s / BASELINE_IMG_PER_SEC, 2)
                        if args.model == "vit-large" else None),
    }))
    if args.serve:
        p50, device_ms = bench_serve_latency()
        print(json.dumps({
            "metric": "serve_latency_p50", "value": round(p50, 2), "unit": "ms",
            "vs_baseline": None,
            "device_ms": round(device_ms, 2),
            "roundtrip_ms": round(p50 - device_ms, 2),
        }))


if __name__ == "__main__":
    main()
