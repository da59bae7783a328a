"""Seed the reviewer state machine: rename every image to ``.pending``.

Parity with ``/root/reference/reviewer/init_images.py:5-50``: walks
``data/<label>/``, skips the per-label reference image ``0.jpg``, renames
``<name>.<ext>`` to ``<name>.pending`` (idempotent — already-pending files
are left alone).
"""
from __future__ import annotations

import os


def initialize_pending(data_dir: str = "data") -> int:
    total = 0
    for label in sorted(os.listdir(data_dir)):
        label_dir = os.path.join(data_dir, label)
        if not os.path.isdir(label_dir):
            continue
        processed = 0
        for filename in sorted(os.listdir(label_dir)):
            if filename == "0.jpg":
                continue
            src = os.path.join(label_dir, filename)
            if not os.path.isfile(src):
                continue
            basename, ext = os.path.splitext(filename)
            if ext == ".pending":
                continue
            os.rename(src, os.path.join(label_dir, f"{basename}.pending"))
            processed += 1
        print(f"{label}: {processed} files -> .pending")
        total += processed
    return total


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", default="data")
    args = parser.parse_args()
    print(f"Initialized {initialize_pending(args.data_dir)} files")
