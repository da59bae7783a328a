"""Family-specific training tasks plugged into the unified Trainer.

- :class:`MoETask` — the ResMoE objective (``TIC/ResMoE/train.py:21-74``):
  symmetric CE + load-balance penalty, one-hot targets, plus logged
  classification/balance components.
- :class:`TreeRootTask` / :class:`TreeSonsTask` / :class:`TreeFullTask` — the
  TreeViT staged curriculum (``TIC/TreeViT/train.py:139-179``), with the
  reference's WIP bugs fixed (SURVEY §"Reference bugs"): root is trained on
  (image -> category) labels, sons are trained teacher-routed on their own
  categories IN PARALLEL (the TPU equivalent of the reference's sequential
  per-son loops), then the full tree end-to-end. The reference applies its
  ``symmetric_cross_entropy`` to integer targets, which crashes in torch;
  here targets are one-hot so SCE is well-defined.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import MoEConfig, TreeViTConfig
from ..ops import moe_dispatch as md
from . import losses
from .trainer import ClassificationTask


class MoETask(ClassificationTask):
    def __init__(self, cfg: MoEConfig):
        self.cfg = cfg

    def loss(self, outputs, soft_labels):
        logits, gate_dense, top_i = outputs
        cls_loss = losses.symmetric_cross_entropy(
            logits, soft_labels, self.cfg.sce_alpha, self.cfg.sce_beta
        )
        if self.cfg.balance_loss == "switch":
            bal_loss = losses.switch_load_balance_loss(
                gate_dense, top_i, self.cfg.num_experts)
        else:
            bal_loss = losses.load_balance_loss(gate_dense)
        total = cls_loss + self.cfg.balance_loss_alpha * bal_loss
        aux = {"classification_loss": cls_loss, "balance_loss": bal_loss}
        if self.cfg.routing == "sparse":
            # routing-dynamics telemetry (per step, averaged per epoch in
            # metrics.jsonl): per-expert assignment share spread and the
            # fraction of routed copies the capacity dispatch drops —
            # counts beyond an expert's capacity lose their slot
            # (ops/moe_dispatch.py make_dispatch_plan)
            b = gate_dense.shape[0]
            counts = jnp.zeros((self.cfg.num_experts,), jnp.float32).at[
                top_i.reshape(-1)].add(1.0)
            capacity = md.capacity_for(b, self.cfg.top_k,
                                       self.cfg.num_experts,
                                       self.cfg.capacity_factor)
            load = counts / (b * self.cfg.top_k)
            aux["drop_frac"] = (jnp.sum(jnp.maximum(counts - capacity, 0.0))
                                / (b * self.cfg.top_k))
            aux["expert_load_max"] = jnp.max(load)
            aux["expert_load_min"] = jnp.min(load)
        return total, aux

    def logits(self, outputs):
        return outputs[0]


class _TreeTaskBase(ClassificationTask):
    """Shared plumbing: category map (class idx -> category idx) for
    relabeling/routing."""

    def __init__(self, cfg: TreeViTConfig, class_to_category: np.ndarray):
        self.cfg = cfg
        # numpy, NOT jnp: tasks are constructed before run() calls
        # initialize_distributed, and a constructor-time jnp.asarray would
        # initialize the XLA backend too early for multi-host launches
        # (CLAUDE.md lesson: constants shared by jitted fns stay numpy
        # until first traced use)
        self._class_to_category = np.asarray(class_to_category, np.int32)

    @property
    def class_to_category(self) -> jnp.ndarray:
        return jnp.asarray(self._class_to_category)


class TreeRootTask(_TreeTaskBase):
    """Stage 1: root learns (image -> category). Sons frozen by the stage's
    optimizer mask (see ``train/treevit.py``)."""

    def loss(self, outputs, soft_labels):
        choice = outputs[1]
        # map class one-hots to category one-hots: matmul with the 0/1 map
        n_cat = int(self.cfg.num_categories)
        cat_map = jnp.zeros((soft_labels.shape[-1], n_cat), soft_labels.dtype)
        cat_map = cat_map.at[
            jnp.arange(soft_labels.shape[-1]), self.class_to_category
        ].set(1.0)
        cat_targets = soft_labels @ cat_map
        return losses.symmetric_cross_entropy(choice, cat_targets), {}

    def logits(self, outputs):
        return outputs[1]  # category logits

    def labels(self, batch):
        # eval in category space (the CategoryDataset relabeling,
        # TIC/TreeViT/train.py:53-69)
        return self.class_to_category[batch["label"]]


class TreeSonsTask(_TreeTaskBase):
    """Stage 2: teacher-forced routing to the true category's son; every son
    trains on its own subset simultaneously."""

    def forward(self, model, variables, images, batch, train, rngs):
        # Teacher-forced routing only while TRAINING; eval goes through the
        # root's real top-k routing so the stage's val_loss/val_acc (which
        # drive early stopping and checkpoint top-k) measure actual
        # inference behavior, not teacher-routed accuracy.
        route = self.class_to_category[batch["label"]] if train else None
        out = model.apply(
            variables, images, deterministic=not train, route_labels=route,
            rngs=rngs if train else None,
        )
        return out, {}

    def loss(self, outputs, soft_labels):
        return _tree_combined_loss(outputs, soft_labels)

    def logits(self, outputs):
        return outputs[0]


class TreeFullTask(_TreeTaskBase):
    """Stage 3: end-to-end on class labels through root routing."""

    def loss(self, outputs, soft_labels):
        return _tree_combined_loss(outputs, soft_labels)

    def logits(self, outputs):
        return outputs[0]


def _tree_combined_loss(outputs, soft_labels):
    combined, _choice, kept = outputs
    # samples whose every routed copy was capacity-dropped carry no signal:
    # mask them out of the loss instead of training on all-zero logits (the
    # reference's dynamic loop computes every sample; drops are the price of
    # static shapes, surfaced here as a metric)
    w = (kept > 0).astype(jnp.float32)
    sce = losses.symmetric_cross_entropy(combined, soft_labels,
                                         sample_weights=w)
    return sce, {"dropped_frac": 1.0 - jnp.mean(w)}
