"""Ablation launcher: the ``TIC.ViT.ntrain_but_div`` equivalent — one preset
toggle off the main recipe (reference: TIC/ViT/ntrain_but_div.py)."""
from .ntrain import main

if __name__ == "__main__":
    main(preset="nvit_but_div")
