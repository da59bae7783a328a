"""Ablation launcher: the ``TIC.ViT.ntrain_unfiltered_unaug`` equivalent — one preset
toggle off the main recipe (reference: TIC/ViT/ntrain_unfiltered_unaug.py)."""
from .ntrain import main

if __name__ == "__main__":
    main(preset="nvit_unfiltered_unaug")
