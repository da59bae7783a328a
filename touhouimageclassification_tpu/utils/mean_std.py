"""Per-dataset normalization statistics with on-disk cache.

Parity with ``calculate_mean_std`` (``TIC/utils/preprocess.py:81-128``): one
pass over the dataset at a given image size, float64 accumulation, and —
deliberately — the same *approximation* the reference uses: the cached "std"
is the average of per-image stds, not the true dataset std
(``preprocess.py:116-117``). Checkpoints trained against these statistics
(the finetune/serve path) only reproduce if we normalize identically, so the
quirk is kept and documented. Cache file: ``meta_mean_std.json`` (the
reference's ``meta_mean_std.pth`` is read as a fallback via torch-cpu).
"""
from __future__ import annotations

import json
import os

import numpy as np

META_MEAN_STD_FILENAME = "meta_mean_std.json"
REFERENCE_MEAN_STD = "meta_mean_std.pth"


def calculate_mean_std(
    data_dir: str,
    image_size: tuple[int, int],
    batch_size: int = 32,
    cache: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    from ..data.folder import scan_image_folder
    from ..data.loader import HostImageLoader

    index = scan_image_folder(data_dir, persist_class_map=False)
    # statistics must cover the FULL dataset on every host: pin a
    # single-process view so multi-process JAX doesn't stride-shard the
    # scan (every host then computes — and caches — identical values)
    # on_error='skip': this path also runs on freshly crawled corpora (the
    # serve/filter CLIs compute stats before judging) where a few corrupt
    # files must not abort the run — they are masked out of the statistics
    loader = HostImageLoader(
        index, batch_size=batch_size, canvas=image_size, shuffle=False,
        drop_last=False, process_shard=(0, 1), on_error="skip",
    )
    mean = np.zeros(3, np.float64)
    std = np.zeros(3, np.float64)
    n = 0
    for batch in loader:
        imgs = batch["image"][batch["mask"]].astype(np.float64) / 255.0  # (b,h,w,3)
        b = imgs.shape[0]
        if b == 0:
            continue
        per_image = imgs.reshape(b, -1, 3)
        mean += per_image.mean(axis=(0, 1)) * b
        # reference quirk: average of per-image stds, weighted by batch size
        std += per_image.std(axis=1, ddof=1).mean(axis=0) * b
        n += b
    if n == 0:
        raise ValueError(f"no decodable images under {data_dir}")
    mean /= n
    std /= n
    if cache:
        with open(os.path.join(data_dir, META_MEAN_STD_FILENAME), "w") as f:
            json.dump({"mean": mean.tolist(), "std": std.tolist()}, f)
    return mean, std


def get_mean_std(data_dir: str, image_size: tuple[int, int]) -> tuple[np.ndarray, np.ndarray]:
    """Cached statistics lookup (``get_transforms``' cache behavior,
    ``TIC/utils/preprocess.py:61-72``)."""
    json_path = os.path.join(data_dir, META_MEAN_STD_FILENAME)
    if os.path.exists(json_path):
        with open(json_path) as f:
            meta = json.load(f)
        return np.asarray(meta["mean"]), np.asarray(meta["std"])
    pth_path = os.path.join(data_dir, REFERENCE_MEAN_STD)
    if os.path.exists(pth_path):
        import torch

        meta = torch.load(pth_path, weights_only=False, map_location="cpu")
        return meta["mean"].numpy(), meta["std"].numpy()
    return calculate_mean_std(data_dir, image_size)
