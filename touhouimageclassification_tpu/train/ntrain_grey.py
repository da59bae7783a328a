"""Ablation launcher: the ``TIC.ViT.ntrain_grey`` equivalent — one preset
toggle off the main recipe (reference: TIC/ViT/ntrain_grey.py)."""
from .ntrain import main

if __name__ == "__main__":
    main(preset="nvit_grey")
