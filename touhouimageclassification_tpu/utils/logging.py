"""File + console logging per run.

Parity with ``get_logger`` (``TIC/ViT/finetune.py:21-52``, duplicated in
``pretrain.py`` and ``ResNet/train.py`` — deduplicated here): a named logger
writing to ``<log_dir>/<name>.log`` and stdout with the same format.
"""
from __future__ import annotations

import logging
import os
import sys


def get_logger(name: str, log_dir: str = "log") -> logging.Logger:
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        # multi-host: non-primary processes log per-process files so hosts
        # on shared storage never interleave writes into one .log
        try:
            import jax

            pid = jax.process_index() if jax.process_count() > 1 else 0
        except Exception:
            pid = 0
        suffix = f".p{pid}" if pid else ""
        fh = logging.FileHandler(os.path.join(log_dir, f"{name}{suffix}.log"))
        ch = logging.StreamHandler(sys.stdout)
        fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        for h in (fh, ch):
            h.setLevel(logging.INFO)
            h.setFormatter(fmt)
            logger.addHandler(h)
    return logger
