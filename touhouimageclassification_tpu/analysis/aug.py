"""Augmentation visualizer.

Parity with ``TIC/analysis/aug.py:12-45``: apply the named transform recipes
(original / grey / colorjitter x8 / full x16) to one image and save a PNG
grid per recipe under ``show_augmentation/`` — except the transforms are this
framework's on-device jitted recipes, so what you inspect is exactly what
training sees.

CLI: ``python -m touhouimageclassification_tpu.analysis.aug --image x.jpg``
"""
from __future__ import annotations

import os

import numpy as np

from ..config import AugmentConfig
from ..ops import augment as A

# (name, config, repeats) — mirrors the AUGS table shape of the reference
AUGS: list[tuple[str, AugmentConfig | None, int]] = [
    ("original", None, 1),
    ("grey", AugmentConfig(only_grey_augmentation=True), 8),
    ("colorjitter", AugmentConfig(enable_generalization=False), 8),
    ("full", AugmentConfig(), 16),
]


def visualize(image_path: str, out_dir: str = "show_augmentation",
              out_size: tuple[int, int] = (224, 224), seed: int = 0) -> list[str]:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    with Image.open(image_path) as im:
        im = im.convert("RGB").resize((256, 256), Image.BILINEAR)
        base = np.asarray(im, np.float32) / 255.0

    written = []
    for name, cfg, repeats in AUGS:
        if cfg is None:
            tiles = [base[None]]
        else:
            # visualize pre-normalization pixels: run the recipe without the
            # final normalize by inverting it afterwards
            fn = jax.jit(A.build_augment_fn(cfg, out_size))
            tiles = []
            for i in range(repeats):
                out = fn(jax.random.key(seed + i), jnp.asarray(base[None]))
                out = np.asarray(out)
                out = out * np.asarray(cfg.std) + np.asarray(cfg.mean)  # denorm
                tiles.append(np.clip(out, 0, 1))
        grid = _to_grid(np.concatenate(tiles, axis=0))
        path = os.path.join(out_dir, f"{name}.png")
        Image.fromarray((grid * 255).astype(np.uint8)).save(path)
        written.append(path)
    return written


def _to_grid(batch: np.ndarray) -> np.ndarray:
    n, h, w, c = batch.shape
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    grid = np.ones((rows * h, cols * w, c), batch.dtype)
    for i in range(n):
        r, col = divmod(i, cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = batch[i]
    return grid


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description="Visualize augmentation recipes")
    parser.add_argument("--image", required=True)
    parser.add_argument("--out-dir", default="show_augmentation")
    args = parser.parse_args()
    for p in visualize(args.image, args.out_dir):
        print(p)
