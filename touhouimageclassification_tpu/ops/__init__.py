"""TPU compute ops: on-device augmentation, mixing, attention/patch-embed
kernels, MoE dispatch."""
