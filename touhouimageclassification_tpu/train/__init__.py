"""Unified training: one trainer replacing both reference styles (the
hand-rolled AMP loops of ``finetune.py``/``pretrain.py``/``ResNet/train.py``
and the Lightning modules of ``ntrain.py``/``ResMoE``/``TreeViT``)."""
