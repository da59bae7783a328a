"""ImageFolder indexing and class-map persistence.

Parity with torchvision ``ImageFolder`` semantics as used by the reference
(``TIC/utils/preprocess.py:15-46``): classes = sorted subdirectory names,
``class_to_idx`` = {name: position}, persisted next to the data so serving and
filtering reuse the exact training-time mapping. The reference stores a
pickled ``class_to_idx.pth``; this build stores JSON (`class_to_idx.json`)
and, for compatibility, can read a reference ``.pth`` via torch-cpu when the
JSON is absent.

Also fixes the reference bug where ``get_class_to_idx`` checks existence of
the bare filename instead of the ``data_dir``-joined path
(``TIC/utils/preprocess.py:43``).
"""
from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

CLASS_TO_IDX_FILENAME = "class_to_idx.json"
REFERENCE_CLASS_TO_IDX = "class_to_idx.pth"  # reference artifact, readable

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".gif")


@dataclasses.dataclass
class ImageFolderIndex:
    root: str
    classes: list[str]
    class_to_idx: dict[str, int]
    paths: list[str]
    labels: np.ndarray  # int32 (N,)

    def __len__(self) -> int:
        return len(self.paths)


def scan_image_folder(root: str, persist_class_map: bool = True) -> ImageFolderIndex:
    classes = sorted(
        d for d in os.listdir(root)
        # hidden dirs are never classes: the canvas cache lives at
        # <root>/.tic_canvas_cache and must not shift every label index
        # when a dataset is rescanned after an epoch ran with caching on
        if os.path.isdir(os.path.join(root, d)) and not d.startswith(".")
    )
    for d in os.listdir(root):
        # torchvision ImageFolder WOULD have treated a hidden dir as a class;
        # make the (intentional) divergence visible instead of silently
        # shifting label ids for datasets that legitimately used one
        if (d.startswith(".") and d != ".tic_canvas_cache"
                and os.path.isdir(os.path.join(root, d))):
            import warnings

            warnings.warn(
                f"ignoring hidden directory {d!r} under {root}: hidden dirs "
                "are never classes (unlike torchvision ImageFolder)",
                stacklevel=2,
            )
    if not classes:
        raise FileNotFoundError(f"No class subdirectories under {root}")
    class_to_idx = {c: i for i, c in enumerate(classes)}
    paths: list[str] = []
    labels: list[int] = []
    for c in classes:
        cdir = os.path.join(root, c)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith(IMG_EXTENSIONS):
                paths.append(os.path.join(cdir, fname))
                labels.append(class_to_idx[c])
    if persist_class_map:
        map_path = os.path.join(root, CLASS_TO_IDX_FILENAME)
        if not os.path.exists(map_path):
            with open(map_path, "w") as f:
                json.dump(class_to_idx, f, indent=0, sort_keys=True)
    return ImageFolderIndex(
        root=root,
        classes=classes,
        class_to_idx=class_to_idx,
        paths=paths,
        labels=np.asarray(labels, np.int32),
    )


def get_class_to_idx(data_dir: str) -> dict[str, int]:
    """Load the persisted class map, generating it on first use
    (``TIC/utils/preprocess.py:42-46`` with the path bug fixed)."""
    json_path = os.path.join(data_dir, CLASS_TO_IDX_FILENAME)
    if os.path.exists(json_path):
        with open(json_path) as f:
            return {k: int(v) for k, v in json.load(f).items()}
    pth_path = os.path.join(data_dir, REFERENCE_CLASS_TO_IDX)
    if os.path.exists(pth_path):
        import torch  # CPU-only; reading reference artifacts

        mapping = torch.load(pth_path, weights_only=False, map_location="cpu")
        return {k: int(v) for k, v in mapping.items()}
    return scan_image_folder(data_dir).class_to_idx


def random_split(n: int, train_fraction: float, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic train/val split (the ``torch.utils.data.random_split``
    analogue used at ``ntrain.py:138-140`` and ``finetune.py:151-157``)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    train_size = int(n * train_fraction)
    return perm[:train_size], perm[train_size:]
