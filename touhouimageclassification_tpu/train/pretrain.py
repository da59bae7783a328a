"""ViT scratch pretraining (the ``TIC.ViT.pretrain`` equivalent).

Reference recipe (``TIC/ViT/pretrain.py:272-340``): same loop as finetune
with ``USE_PRETRAINED=False``, 60 epochs, batch 80, LR 1e-4, early-stop
patience 3. (The reference's result: scratch ViT overfits to ~30-40% —
report.pdf p.5 §3.2 — the capability is preserved for completeness.)
"""
from __future__ import annotations

from .finetune import main as _main


def main(argv=None):
    return _main(argv, preset="pretrain_vit")


if __name__ == "__main__":
    main()
