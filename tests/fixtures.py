"""Synthetic ImageFolder fixtures.

Plays the role of the reference's ``sample_dataset.py`` mini-datasets
(``TIC/utils/sample_dataset.py:8-22``): tiny class-separable images so an
end-to-end train run can show learning signal in seconds.
"""
import os

import numpy as np
from PIL import Image


def make_image_folder(
    root: str, num_classes: int = 4, per_class: int = 12, size: int = 48, seed: int = 0
) -> str:
    """Each class = a distinct solid base color + noise, so even two epochs of
    a tiny model separates them."""
    rng = np.random.default_rng(seed)
    base_colors = rng.integers(0, 256, size=(num_classes, 3))
    for c in range(num_classes):
        cdir = os.path.join(root, f"class_{c:02d}")
        os.makedirs(cdir, exist_ok=True)
        for i in range(per_class):
            noise = rng.normal(0, 20, size=(size, size, 3))
            img = np.clip(base_colors[c] + noise, 0, 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(cdir, f"{i}.jpg"), quality=90)
    return root
