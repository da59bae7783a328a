"""Mini-dataset builder + reviewer reference-image tools.

Parity with ``TIC/utils/sample_dataset.py:8-40``:
- ``sample_dataset(src, dst, p)``: copy a p-fraction per label (the fixture
  mechanism behind the README's CPU-runnable configs),
- ``add_reference``/``del_reference``: inject/remove the per-label reference
  image ``0.jpg`` used by the reviewer apps.
"""
from __future__ import annotations

import os
import random
import shutil


def sample_dataset(src: str, dst: str, p: float, seed: int = 0) -> int:
    """Copy ~p of each label's images; returns total copied."""
    rng = random.Random(seed)
    total = 0
    for label in sorted(os.listdir(src)):
        ldir = os.path.join(src, label)
        if not os.path.isdir(ldir):
            continue
        files = sorted(os.listdir(ldir))
        chosen = [f for f in files if rng.random() < p]
        out = os.path.join(dst, label)
        os.makedirs(out, exist_ok=True)
        for f in chosen:
            shutil.copy(os.path.join(ldir, f), os.path.join(out, f))
        total += len(chosen)
    return total


def add_reference(reference_dir: str, target_dir: str) -> int:
    """Place each label's reference image as ``<label>/0.jpg`` in target."""
    n = 0
    for label in sorted(os.listdir(reference_dir)):
        src_dir = os.path.join(reference_dir, label)
        if not os.path.isdir(src_dir):
            continue
        files = sorted(os.listdir(src_dir))
        if not files:
            continue
        dst_dir = os.path.join(target_dir, label)
        os.makedirs(dst_dir, exist_ok=True)
        shutil.copy(os.path.join(src_dir, files[0]), os.path.join(dst_dir, "0.jpg"))
        n += 1
    return n


def del_reference(target_dir: str) -> int:
    """Remove every ``<label>/0.jpg``."""
    n = 0
    for label in sorted(os.listdir(target_dir)):
        ref = os.path.join(target_dir, label, "0.jpg")
        if os.path.exists(ref):
            os.remove(ref)
            n += 1
    return n


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description="Sample a mini dataset")
    parser.add_argument("--src", required=True)
    parser.add_argument("--dst", required=True)
    parser.add_argument("-p", type=float, default=0.1)
    parser.add_argument("--add-reference", action="store_true")
    parser.add_argument("--del-reference", action="store_true")
    args = parser.parse_args()
    if args.add_reference:
        print(add_reference(args.src, args.dst), "references added")
    elif args.del_reference:
        print(del_reference(args.dst), "references removed")
    else:
        print(sample_dataset(args.src, args.dst, args.p), "images copied")
