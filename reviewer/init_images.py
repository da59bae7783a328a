"""Seed the reviewer state machine: rename every image to ``.pending``.

Parity with ``/root/reference/reviewer/init_images.py:5-50``: walks
``data/<label>/``, skips the per-label reference image ``0.jpg``, renames
``<name>.<ext>`` to ``<name>.pending``.

Idempotence is a SEEDED-STEMS ledger, not just the ``.pending`` skip: after
a review session, approved images are plain ``.jpg`` again — re-running a
naive initializer would erase every judgment by re-queueing them (and
mangle in-flight ``.processing`` names into unparseable multi-dot files).
An approved ``.jpg`` is indistinguishable from a fresh raw image by name
alone, so ``.tic_reviewer_seeded`` records every stem ever queued: re-runs
queue ONLY stems absent from the ledger (supporting the crawl → review →
crawl-more loop that ``reviewer/app.py``'s ``next_free_index`` exists for)
and ``--requeue`` re-queues judged ``.jpg`` too. ``.invalid``/
``.processing`` files are never touched either way. Legacy boolean markers
(no stem list) can't tell new crawls from approvals, so those dirs are
skipped wholesale unless ``--requeue`` upgrades them.
"""
from __future__ import annotations

import os

SEED_MARKER = ".tic_reviewer_seeded"
_HEADER = "# stems queued by reviewer/init_images.py — one per line\n"

# extensions that are already part of the state machine and must never be
# re-queued by a re-run
_STATE_EXTS = (".pending", ".invalid", ".processing")


def _read_seeded_stems(marker: str) -> set[str] | None:
    """Ledger of stems ever queued; None = legacy boolean marker (pre-ledger
    format: a dir seeded before stems were recorded — approvals there are
    indistinguishable from fresh crawls)."""
    stems: set[str] = set()
    legacy = False
    with open(marker) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if line.startswith("seeded by"):
                legacy = True
                continue
            stems.add(line)
    return None if (legacy and not stems) else stems


def _write_marker(marker: str, stems: set[str]) -> None:
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(_HEADER)
        for stem in sorted(stems):
            f.write(stem + "\n")
    os.replace(tmp, marker)


def initialize_pending(data_dir: str = "data", requeue: bool = False) -> int:
    total = 0
    for label in sorted(os.listdir(data_dir)):
        label_dir = os.path.join(data_dir, label)
        if not os.path.isdir(label_dir):
            continue
        marker = os.path.join(label_dir, SEED_MARKER)
        # a crash between _write_marker's tmp write and os.replace leaves a
        # half-written '<marker>.tmp' — never a reviewable image; drop it so
        # the file loop below can't queue it
        stale_tmp = marker + ".tmp"
        if os.path.exists(stale_tmp):
            os.unlink(stale_tmp)
        stems = _read_seeded_stems(marker) if os.path.exists(marker) else set()
        if stems is None:  # legacy marker: no ledger to tell new from judged
            if not requeue:
                print(f"{label}: legacy {SEED_MARKER} (no stem ledger) — "
                      "skipping; pass --requeue to re-queue judged images "
                      "and upgrade the marker")
                continue
            stems = set()
        processed = 0
        for filename in sorted(os.listdir(label_dir)):
            if filename == "0.jpg" or filename.startswith("."):
                continue  # reference image, ledger/marker files, dotfiles
            src = os.path.join(label_dir, filename)
            if not os.path.isfile(src):
                continue
            basename, ext = os.path.splitext(filename)
            if ext in _STATE_EXTS:
                # in-flight / judged-invalid: renaming these would wedge the
                # state machine (a .processing re-queued mid-claim becomes a
                # name no session can complete) — but their TRUE ids belong
                # in the ledger so a later approval (.processing -> .jpg,
                # reviewer/app.py) is never re-queued. Claimed names carry
                # ``<id>.<session_uid>.<timestamp>.processing``; strip the
                # claim decoration (ids themselves may contain dots).
                if ext == ".processing":
                    parts = basename.split(".")
                    stems.add(".".join(parts[:-2]) if len(parts) >= 3
                              else basename)
                else:
                    stems.add(basename)
                continue
            if basename in stems and not requeue:
                continue  # judged before (approved .jpg) — keep the verdict
            os.rename(src, os.path.join(label_dir, f"{basename}.pending"))
            stems.add(basename)
            processed += 1
        _write_marker(marker, stems)
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
