"""Seed the reviewer state machine: rename every image to ``.pending``.

Parity with ``/root/reference/reviewer/init_images.py:5-50``: walks
``data/<label>/``, skips the per-label reference image ``0.jpg``, renames
``<name>.<ext>`` to ``<name>.pending``.

Idempotence is a SEEDED marker, not just the ``.pending`` skip: after a
review session, approved images are plain ``.jpg`` again — re-running a
naive initializer would erase every judgment by re-queueing them (and
mangle in-flight ``.processing`` names into unparseable multi-dot files).
An approved ``.jpg`` is indistinguishable from a fresh raw image by name
alone, so once ``.tic_reviewer_seeded`` exists in a label dir, re-runs skip
the whole dir unless ``--requeue`` is given; ``.invalid``/``.processing``
files are never touched either way.
"""
from __future__ import annotations

import os

SEED_MARKER = ".tic_reviewer_seeded"

# extensions that are already part of the state machine and must never be
# re-queued by a re-run
_STATE_EXTS = (".pending", ".invalid", ".processing")


def initialize_pending(data_dir: str = "data", requeue: bool = False) -> int:
    total = 0
    for label in sorted(os.listdir(data_dir)):
        label_dir = os.path.join(data_dir, label)
        if not os.path.isdir(label_dir):
            continue
        marker = os.path.join(label_dir, SEED_MARKER)
        seeded = os.path.exists(marker)
        if seeded and not requeue:
            print(f"{label}: already seeded ({SEED_MARKER} present) — "
                  "skipping; pass --requeue to re-queue judged images")
            continue
        processed = 0
        for filename in sorted(os.listdir(label_dir)):
            if filename in ("0.jpg", SEED_MARKER):
                continue
            src = os.path.join(label_dir, filename)
            if not os.path.isfile(src):
                continue
            basename, ext = os.path.splitext(filename)
            if ext in _STATE_EXTS:
                # in-flight / judged-invalid: renaming these would wedge the
                # state machine (a .processing re-queued mid-claim becomes a
                # name no session can complete)
                continue
            os.rename(src, os.path.join(label_dir, f"{basename}.pending"))
            processed += 1
        with open(marker, "w") as f:
            f.write("seeded by reviewer/init_images.py\n")
        print(f"{label}: {processed} files -> .pending")
        total += processed
    return total


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--requeue", action="store_true",
                        help="re-queue APPROVED (.jpg) images in already-"
                             "seeded label dirs; rejected (.invalid) and "
                             "in-flight (.processing) files are never touched")
    args = parser.parse_args()
    print(f"Initialized {initialize_pending(args.data_dir, args.requeue)} files")
