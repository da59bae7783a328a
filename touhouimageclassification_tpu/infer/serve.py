"""Serving: model loading, single-image predict, batched dataset judge.

Reference surface (``TIC/utils/serve.py``): ``model_checkpoints`` registry
(:18-22), ``get_model``/``load_model`` dispatch (:24-81), ``serve`` single
image (:83-114), ``init`` (:116-156), ``full_judge`` directory scorer with CSV
``filename,predicted_class,confidence,actual_class,correct,path`` (:158-230),
and the CLI flags of the ``__main__`` block.

TPU-native differences:
- ONE jitted predict graph (resize+normalize+forward+softmax fused) shared by
  every consumer, with padded batch buckets so a handful of compiled shapes
  serves any request size;
- ``full_judge`` scores the dataset in batches of 64 instead of the
  reference's one-image-at-a-time loop (``serve.py:212-213`` — the
  serving-path inefficiency called out in SURVEY §3.3);
- weights are Orbax params directories (optionally converted from reference
  ``.pth`` via ``utils/convert.py``).

CLI: ``python -m touhouimageclassification_tpu.infer.serve --model vit-large
--image data/testset --weights <ckpt> --output result/x.csv --full``
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FILTERED_DATA_DIR, get_image_size
from ..utils.jaxcache import enable_compile_cache
from ..data.folder import IMG_EXTENSIONS, get_class_to_idx
from ..models import apply_model, create_model
from ..ops.augment import normalize, resize
from ..utils.mean_std import get_mean_std

# Default checkpoint registry (orbax params dirs), mirroring
# TIC/utils/serve.py:18-22. Entries are created by training runs or by the
# .pth converter.
model_checkpoints: dict[str, str] = {
    "resnet": "checkpoint/serving/resnet152",
    "vit-base": "checkpoint/serving/vit_base_finetune",
    "vit-large": "checkpoint/serving/vit_large_finetune",
    "nvit": "checkpoint/serving/nvit",
    "resmoe": "checkpoint/serving/resmoe",
}

_SERVE_TYPE_ALIASES = {"resnet": "resnet152", "nvit": "vit-large",
                       "resmoe": "vit-moe", "treevit": "tree-vit"}

# one list for every CLI that picks a judge/serve model (serve, filter) —
# duplicated choice lists drift (filter once rejected 'resmoe'/'treevit'
# even though init() supports them)
MODEL_CHOICES = ["resnet", "vit-base", "vit-large", "nvit", "resmoe",
                 "treevit"]

BUCKETS = (1, 8, 64)


def get_model(model_type: str, num_classes: int):
    """Model-type dispatch (``serve.py:24-45``); 'resnet' = resnet152."""
    mt = model_type.lower().replace("_", "-")
    return create_model(_SERVE_TYPE_ALIASES.get(mt, mt), num_classes=num_classes)


TORCH_CKPT_EXTS = (".pth", ".pt", ".bin", ".safetensors")


def _load_torch_weights(path: str, model, num_classes: int | None,
                        model_type: str | None = None):
    """One shared torch-checkpoint path for ``load_weights`` and ``init``.

    Returns ``(params, model_state, model)`` — ``model`` may be REBUILT when
    ``model_type`` is given and the state dict implies different MoE/TreeViT
    member counts than the default config (the reference stores those counts
    only in the weights; cf. ``TIC/utils/serve.py:47-81`` which sidesteps the
    problem by hardcoding per-type constructors).
    """
    from ..utils.convert import (_normalize_ckpt, load_torch_checkpoint,
                                 member_overrides)

    if path.endswith(".safetensors"):
        from ..utils.pretrained import _load_state_dict

        ckpt = _load_state_dict(path)
    else:
        ckpt = _normalize_ckpt(path)
    if model_type is not None:
        overrides = member_overrides(ckpt, model_type)
        if overrides:
            model = create_model(model_type, num_classes=num_classes,
                                 **overrides)
    params, model_state = load_torch_checkpoint(ckpt, model, num_classes)
    return params, model_state, model


def load_weights(path: str, model=None, num_classes: int | None = None):
    """Load serving weights.

    Accepts: an Orbax params dir (from ``save_params``), an Orbax training
    checkpoint (full TrainState — params are extracted, tolerating the same
    format diversity the reference handles at ``serve.py:71-77``), or a
    reference ``.pth`` (converted via utils/convert).
    """
    if path.endswith(TORCH_CKPT_EXTS):
        params, model_state, _ = _load_torch_weights(path, model, num_classes)
        return params, model_state
    from ..train.checkpoint import load_params

    restored = load_params(path)
    model_state = {}
    if isinstance(restored, dict):
        if "params" in restored:
            model_state = restored.get("model_state") or {}
            restored = restored["params"]
    return restored, model_state


@dataclass
class Predictor:
    """Frozen-weights jitted inference with padded batch buckets.

    ``mesh``: optional ``jax.sharding.Mesh`` — params replicated, judge
    batches sharded over its 'data' axis, so ``full_judge`` throughput
    scales over a slice (each 64-image bucket runs 8 per-chip on v5e-8).
    Buckets smaller than the mesh are replicated instead (a 1-image
    request gains nothing from sharding).
    """

    model: Any
    params: Any
    model_state: Any
    class_to_idx: dict[str, int]
    image_size: tuple[int, int]
    mean: np.ndarray
    std: np.ndarray
    mesh: Any = None

    def __post_init__(self):
        enable_compile_cache()
        self.idx_to_class = {v: k for k, v in self.class_to_idx.items()}
        mean = tuple(float(m) for m in np.asarray(self.mean).reshape(-1))
        std = tuple(float(s) for s in np.asarray(self.std).reshape(-1))

        model, image_size = self.model, self.image_size

        @partial(jax.jit, static_argnames=())
        def _predict(params, model_state, images_u8):
            imgs = images_u8.astype(jnp.float32) / 255.0
            if imgs.shape[1:3] != image_size:
                imgs = resize(imgs, image_size)
            imgs = normalize(imgs, mean, std)
            outputs, _ = apply_model(
                model, {"params": params, **model_state}, imgs, train=False
            )
            logits = outputs[0] if isinstance(outputs, tuple) else outputs
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            conf = jnp.max(probs, axis=-1)
            pred = jnp.argmax(probs, axis=-1)
            # one output array -> one device->host round trip per request
            return jnp.stack([pred.astype(jnp.float32), conf])

        self._predict = _predict
        # keep weights on device once (replicated over the mesh when given)
        self._batch_sharding = None
        if self.mesh is not None:
            from ..parallel.mesh import data_sharding, replicated

            self._replicated = replicated(self.mesh)
            self._batch_sharding = data_sharding(self.mesh)
            self._params = jax.device_put(self.params, self._replicated)
            self._model_state = jax.device_put(self.model_state,
                                               self._replicated)
        else:
            self._params = jax.device_put(self.params)
            self._model_state = jax.device_put(self.model_state)

    def _put_batch(self, padded: np.ndarray):
        if self._batch_sharding is None:
            return padded
        if padded.shape[0] % self.mesh.shape["data"] == 0:
            return jax.device_put(padded, self._batch_sharding)
        return jax.device_put(padded, self._replicated)

    def warmup(self, buckets=BUCKETS) -> None:
        for b in buckets:
            dummy = np.zeros((b, *self.image_size, 3), np.uint8)
            # through _put_batch so the executables compiled here have the
            # SAME input shardings predict_array uses (a different input
            # sharding is a fresh multi-minute compile on a remote chip)
            np.asarray(self._predict(
                self._params, self._model_state, self._put_batch(dummy)))

    def predict_array(self, images_u8: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(N,H,W,3) uint8 -> (pred_idx (N,), confidence (N,)). Pads to the
        smallest compiled bucket >= N."""
        n = images_u8.shape[0]
        bucket = next((b for b in BUCKETS if b >= n), None)
        if bucket is None:
            # pipelined chunking: the execute for chunk i is dispatched
            # async, so staging chunk i+1 here overlaps its host->device
            # transfer with that execution (the transfer dominates on a
            # tunneled chip); results are fetched once all chunks are in
            step = BUCKETS[-1]
            outs: list[tuple[Any, int]] = []
            staged = self.stage(images_u8[:step])
            i = 0
            while staged is not None:
                out_dev = self._predict(self._params, self._model_state, staged)
                outs.append((out_dev, min(step, n - i)))
                i += step
                nxt = images_u8[i:i + step]
                staged = self.stage(nxt) if len(nxt) else None
            preds, confs = [], []
            for out_dev, cnt in outs:
                out = np.asarray(out_dev)
                preds.append(out[0, :cnt].astype(np.int64))
                confs.append(out[1, :cnt])
            return np.concatenate(preds), np.concatenate(confs)
        padded = np.zeros((bucket, *images_u8.shape[1:]), np.uint8)
        padded[:n] = images_u8
        out = np.asarray(self._predict(
            self._params, self._model_state, self._put_batch(padded)))
        return out[0, :n].astype(np.int64), out[1, :n]

    def stage(self, images_u8: np.ndarray):
        """Pad to a bucket and BEGIN the host->device transfer, returning an
        opaque staged batch for :meth:`predict_staged`.

        Called from a prefetch thread this pipelines the upload of batch i+1
        under the predict of batch i — on a tunneled chip the transfer is
        the judge bottleneck (~36 MB/s measured through the axon relay,
        ~350 ms for a 64x256x256 uint8 batch), and even locally PCIe/ICI
        transfer otherwise serializes with compute. Returns None when N
        exceeds the largest bucket (caller falls back to predict_array)."""
        n = images_u8.shape[0]
        bucket = next((b for b in BUCKETS if b >= n), None)
        if bucket is None:
            return None
        padded = np.zeros((bucket, *images_u8.shape[1:]), np.uint8)
        padded[:n] = images_u8
        if self._batch_sharding is not None:
            return self._put_batch(padded)
        return jax.device_put(padded)

    def predict_staged(self, staged, count: int) -> tuple[np.ndarray, np.ndarray]:
        """Predict on a batch previously staged with :meth:`stage`."""
        out = np.asarray(self._predict(self._params, self._model_state, staged))
        return out[0, :count].astype(np.int64), out[1, :count]

    def predict_images(self, pil_images) -> list[tuple[str, float]]:
        arr = np.stack(
            [_pil_to_canvas(im, self.image_size) for im in pil_images]
        )
        pred, conf = self.predict_array(arr)
        return [(self.idx_to_class[int(p)], float(c)) for p, c in zip(pred, conf)]


def _pil_to_canvas(im, image_size) -> np.ndarray:
    from PIL import Image

    im = im.convert("RGB").resize((image_size[1], image_size[0]), Image.BILINEAR)
    return np.asarray(im, np.uint8)


def serve(predictor: Predictor, image) -> tuple[str, float]:
    """Single-image predict (``serve.py:83-114``): returns
    (class_name, confidence)."""
    return predictor.predict_images([image])[0]


def init(
    args=None, modelt=None, weights=None, data_dir: str = FILTERED_DATA_DIR,
    dp: int = 0,
) -> Predictor:
    """Build a Predictor: class map + weights + normalization statistics
    (``serve.py:116-156``). ``dp`` > 1 shards judge batches over that many
    devices (0/1 = single device)."""
    if args:
        modelt = args.model
        weights = getattr(args, "weights", None)
        data_dir = getattr(args, "data_dir", None) or data_dir
        dp = getattr(args, "dp", dp) or dp
    mt = modelt.lower().replace("_", "-")
    if weights is None:
        weights = model_checkpoints.get(mt)
        if weights is None:
            raise ValueError(f"No default checkpoint found for model type: {mt}")

    # serving_meta.json (written by export_for_serving) makes the export
    # self-describing: exact architecture, training-time class map and
    # normalization stats
    meta = None
    meta_path = os.path.join(weights, "serving_meta.json") if os.path.isdir(
        weights) else None
    if meta_path and os.path.exists(meta_path):
        import json

        with open(meta_path) as f:
            meta = json.load(f)

    if meta and meta.get("class_to_idx"):
        class_to_idx = {k: int(v) for k, v in meta["class_to_idx"].items()}
    else:
        class_to_idx = get_class_to_idx(data_dir)
    num_classes = len(class_to_idx)

    if meta and "vit_config" in meta:
        from ..config import ViTConfig
        from ..models.vit import ViT as _ViT

        vcfg = ViTConfig(**meta["vit_config"])
        model = _ViT(vcfg)
        image_size = (vcfg.image_size, vcfg.image_size)
    else:
        model = get_model(mt, num_classes)
        image_size = get_image_size(_SERVE_TYPE_ALIASES.get(mt, mt))

    if weights.endswith(TORCH_CKPT_EXTS):
        # reference torch checkpoints: MoE/TreeViT member counts live in the
        # state dict, not the config — the shared helper rebuilds the model
        # to match before converting (no-op for ViT/ResNet)
        params, model_state, model = _load_torch_weights(
            weights, model, num_classes,
            model_type=_SERVE_TYPE_ALIASES.get(mt, mt))
    else:
        params, model_state = load_weights(weights, model, num_classes)
    if meta:
        mean, std = np.asarray(meta["mean"]), np.asarray(meta["std"])
    else:
        # converted/legacy weights: dataset statistics (the reference's
        # get_transforms behavior)
        mean, std = get_mean_std(data_dir, image_size)
    mesh = None
    if dp and dp > 1:
        from ..parallel.mesh import create_mesh

        # a dp that divides no compile bucket would silently shard nothing;
        # clamp to the largest divisor of the biggest bucket (and of the
        # device count) and say so
        n = min(dp, len(jax.devices()))
        while n > 1 and BUCKETS[-1] % n:
            n -= 1
        if n != dp:
            print(f"--dp {dp} adjusted to {n} "
                  f"(must divide the {BUCKETS[-1]}-image judge bucket and "
                  f"fit {len(jax.devices())} devices)")
        if n > 1:
            mesh = create_mesh(num_data=n, devices=jax.devices()[:n])
    return Predictor(
        model=model, params=params, model_state=model_state,
        class_to_idx=class_to_idx, image_size=image_size, mean=mean, std=std,
        mesh=mesh,
    )


def _judge_canvas_cache(image_dir: str, image_size: tuple[int, int],
                        mode: str):
    """Resolve a decoded-canvas cache for judging ``image_dir``.

    ``mode``: ``'off'`` never; ``'auto'`` reuse a VALID existing cache (the
    one a training run with ``TrainConfig.canvas_cache`` left behind) but
    never allocate a fresh multi-GB memmap just for a judge pass; ``'on'``
    create/fill one (at the trainer's default 256x256 canvas) so repeated
    judge/filter/acc sweeps over the same dataset pay JPEG decode once.

    Returns ``(cache, slot_of_path, canvas)`` or ``(None, None, image_size)``
    when no cache applies (non-ImageFolder trees, stale caches in auto mode).
    """
    if mode == "off":
        return None, None, image_size
    from ..data.folder import scan_image_folder

    try:
        index = scan_image_folder(image_dir, persist_class_map=False)
    except (FileNotFoundError, NotADirectoryError):
        return None, None, image_size
    from ..data.canvas_cache import CanvasCache, find_existing_canvas

    # never an upscaling canvas (min_size): feeding the model from a
    # smaller-than-input cache would silently change predictions
    canvas, fp = find_existing_canvas(index, min_size=image_size,
                                      with_fingerprint=True)
    if canvas is None:
        if mode != "on":
            return None, None, image_size
        # trainer-default canvas so a later training run hits this cache too
        canvas = (max(256, image_size[0]), max(256, image_size[1]))
    # the probe just computed the fingerprint: don't re-stat the corpus
    cache = CanvasCache(index, canvas, fingerprint=fp)
    slot_of_path = {p: i for i, p in enumerate(index.paths)}
    return cache, slot_of_path, canvas


def full_judge(
    predictor: Predictor,
    image_dir: str,
    output: str | None = None,
    batch_size: int = 64,
    progress: bool = True,
    canvas_cache: str | bool = "auto",
) -> float:
    """Directory walk -> batched scoring -> CSV + accuracy
    (``serve.py:158-230``; same CSV schema, batched instead of batch-1).

    TPU-native throughput differences from the reference loop:
    - host prep of batch i+1 overlaps the device predict of batch i (the
      reference decodes and infers strictly serially, ``serve.py:212-213``);
    - with ``canvas_cache`` (default ``'auto'``) a training run's decoded-
      canvas memmap feeds the judge directly — repeat judge/filter/acc
      sweeps over a just-trained dataset skip JPEG decode entirely (the
      jitted predict graph resizes canvas->model size on device, the same
      path the trainer's eval uses). ``'on'`` builds the cache if absent;
      ``'off'`` always decodes at model size. Known semantic of 'auto':
      the cached path resamples canvas->model on device while the decode
      path decodes straight to model size, so per-image confidences can
      differ in the last digits between a cached and a cache-less copy of
      the same dataset (the cached pixels match what training/eval saw;
      caches smaller than the model input are never used).
    """
    entries: list[tuple[str, str, str]] = []  # (filename, label, path)
    for root, _dirs, files in os.walk(image_dir):
        for filename in sorted(files):
            if os.path.splitext(filename)[1].lower() in IMG_EXTENSIONS:
                entries.append((filename, os.path.basename(root), os.path.join(root, filename)))
    print(f"scoring {len(entries)} images under {image_dir}")

    mode = {True: "on", False: "off"}.get(canvas_cache, canvas_cache)
    cache, slot_of_path, canvas = _judge_canvas_cache(
        image_dir, predictor.image_size, mode)
    if cache is not None and not all(e[2] in slot_of_path for e in entries):
        # files outside the class-dir layout (e.g. images at the root):
        # slots don't cover the walk, judge without the cache
        cache, canvas = None, predictor.image_size
    if cache is not None:
        print(f"canvas cache: {canvas[0]}x{canvas[1]}, "
              f"{cache.hit_rate() * 100:.0f}% warm")

    out_f = csv_w = None
    if output:
        import csv as _csv

        # csv.writer, not raw f-strings: filter._kept_rows reads this back
        # with csv.DictReader, so a comma in a filename/label/path must be
        # quoted or every later column silently shifts
        out_f = open(output, "w", newline="")
        # \n terminator (csv default is \r\n) keeps byte parity with the
        # reference's print()-written CSVs
        csv_w = _csv.writer(out_f, lineterminator="\n")
        csv_w.writerow(["filename", "predicted_class", "confidence",
                        "actual_class", "correct", "path"])

    from concurrent.futures import ThreadPoolExecutor

    from ..data.loader import decode_batch_into

    def prep(chunk):
        imgs = np.empty((len(chunk), *canvas, 3), np.uint8)
        paths = [e[2] for e in chunk]
        # corrupt/truncated files (a crawled corpus always has a few) must
        # not abort a long judging run: undecodable slots are zero-filled,
        # skipped in the CSV/accuracy, and reported at the end (the
        # reference's per-image PIL loop crashes instead, serve.py:212-213)
        if cache is not None:
            ids = np.asarray([slot_of_path[p] for p in paths])
            hit = cache.fetch(ids, imgs)
            miss = np.nonzero(~hit)[0]
            bad: set[int] = set()
            if miss.size:
                decoded = np.empty((miss.size, *canvas, 3), np.uint8)
                failed = decode_batch_into(
                    [paths[j] for j in miss], canvas, decoded, pool=pool,
                    on_error="zero")
                imgs[miss] = decoded
                failed = np.asarray(sorted(failed), np.int64)
                bad = {int(j) for j in miss[failed]}
                # never mark an undecodable slot cache-done — the same
                # setdiff1d invariant as data/loader.py:_make_batch
                good = np.setdiff1d(np.arange(miss.size), failed)
                if good.size:
                    cache.store(ids[miss[good]], decoded[good])
        else:
            # native C++ batch decode when built (~4x PIL on this host);
            # judging large uncached datasets is host-decode-bound
            failed = decode_batch_into(paths, canvas, imgs, pool=pool,
                                       on_error="zero")
            bad = {int(j) for j in failed}
        # stage the upload here too: host->device transfer of batch i+1
        # rides under the predict of batch i (the transfer, not decode or
        # compute, is the judge bottleneck on a tunneled chip)
        staged = predictor.stage(imgs)
        return ((imgs, None) if staged is None else (staged, len(chunk)),
                bad)

    correct_cnt, cnt, skipped = 0, 0, []
    starts = list(range(0, len(entries), batch_size))
    iterator = starts
    if progress:
        import tqdm

        iterator = tqdm.tqdm(starts, desc="Processing batches", unit="batch")
    with ThreadPoolExecutor(max_workers=16) as pool, \
            ThreadPoolExecutor(max_workers=1) as ahead:
        pending = None
        if starts:
            pending = ahead.submit(prep, entries[:batch_size])
        for i, start in enumerate(iterator):
            chunk = entries[start:start + batch_size]
            (imgs, staged_n), bad = pending.result()
            if i + 1 < len(starts):  # overlap next host prep w/ this predict
                nxt = entries[starts[i + 1]:starts[i + 1] + batch_size]
                pending = ahead.submit(prep, nxt)
            if staged_n is not None:
                pred, conf = predictor.predict_staged(imgs, staged_n)
            else:
                pred, conf = predictor.predict_array(imgs)
            for j, ((filename, label, path), p, c) in enumerate(
                    zip(chunk, pred, conf)):
                if j in bad:
                    skipped.append(path)
                    continue
                predicted = predictor.idx_to_class[int(p)]
                ok = predicted == label
                cnt += 1
                correct_cnt += ok
                if csv_w:
                    csv_w.writerow([filename, predicted, f"{float(c):.4f}",
                                    label, ok, path])
    if out_f:
        out_f.close()
    if cache is not None:
        cache.flush()  # fill pass done: durable, marker dropped
    acc = correct_cnt / cnt if cnt else 0.0
    if skipped:
        print(f"skipped {len(skipped)} undecodable image(s), e.g. "
              f"{skipped[0]} (excluded from the CSV and accuracy)")
    print(f"scored {cnt} images, {correct_cnt} correct -> top-1 {acc * 100:.2f}%")
    return acc


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="Serve a model for inference.")
    parser.add_argument("--model", type=str, required=True,
                        choices=MODEL_CHOICES)
    parser.add_argument("--image", type=str, required=True,
                        help="Path to an image or a directory of images.")
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--data-dir", type=str, default=FILTERED_DATA_DIR)
    parser.add_argument("-o", "--output", type=str, default="serve.out")
    parser.add_argument("--full", action="store_true")
    parser.add_argument("--dp", type=int, default=0,
                        help="shard judge batches over this many devices "
                             "(0/1 = single device)")
    parser.add_argument("--canvas-cache", choices=["auto", "on", "off"],
                        default="auto",
                        help="with --full: reuse (auto) or build (on) the "
                             "dataset's decoded-canvas cache so repeat "
                             "judge sweeps skip JPEG decode")
    args = parser.parse_args(argv)

    predictor = init(args, data_dir=args.data_dir)
    if args.full:
        full_judge(predictor, args.image, args.output,
                   canvas_cache=args.canvas_cache)
        return
    if os.path.isfile(args.image):
        from PIL import Image

        with Image.open(args.image) as im:
            predicted, confidence = serve(predictor, im)
        print(f"Prediction: {predicted} (Confidence: {confidence:.4f})")
    elif os.path.isdir(args.image):
        with open(args.output, "a") as f:
            for filename in sorted(os.listdir(args.image)):
                path = os.path.join(args.image, filename)
                if os.path.isfile(path) and os.path.splitext(filename)[1].lower() in IMG_EXTENSIONS:
                    from PIL import Image

                    with Image.open(path) as im:
                        predicted, confidence = serve(predictor, im)
                    print(f"Prediction: {predicted} (Confidence: {confidence:.4f})")
                    f.write(f"{filename} {predicted} {confidence:.4f}\n")
    else:
        raise SystemExit(f"Error: Image path '{args.image}' is not valid.")


if __name__ == "__main__":
    main()
