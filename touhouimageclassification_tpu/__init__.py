"""TouhouIC-TPU: a TPU-native image-classification framework.

Rebuild of the capabilities of ``fAKe2004/TouhouImageClassification``
(reference mounted at /root/reference) as an idiomatic JAX/XLA/Pallas
framework: Flax models, on-device augmentation, data-parallel training over a
``jax.sharding.Mesh``, Orbax checkpointing, a jitted batched serving graph,
and the surrounding pipeline tooling (dataset filtering, evaluation harness,
web demo, reviewer, crawler).

Subpackages
-----------
- ``config``     typed configuration + ablation presets
  (reference: TIC/utils/parameter.py, TIC/ViT/ntrain_*.py launchers)
- ``models``     Flax model families: ViT, ResNet, ResMoE, TreeViT
- ``ops``        TPU compute ops: Pallas attention/patch-embed, on-device
  augmentation, CutMix/MixUp, MoE dispatch
- ``data``       host-side image decode + device-side pipeline
- ``parallel``   mesh/sharding helpers (DP/EP over ICI)
- ``train``      unified trainer, optimizers/schedules, checkpointing
- ``infer``      serving, dataset filtering, model daemon
- ``analysis``   accuracy sweep + augmentation visualizer
- ``utils``      class maps, mean/std, sha checks, converters, misc tools
"""

__version__ = "0.1.0"
