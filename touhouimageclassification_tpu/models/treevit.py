"""TreeViT: hierarchical classifier — root picks categories, sons classify.

Reference (``TIC/TreeViT/model.py:7-30``): a root ViT scores C categories,
top-k categories are picked per sample, each sample is pushed through its
chosen son ViTs via a per-sample Python loop, and son logits are combined
with softmaxed top-k weights (bmm).

TPU-native design: the per-sample loop (``model.py:19-22`` — data-dependent
Python control flow, unjittable) becomes the same capacity-based dispatch
used by sparse MoE: sons are one stacked module, chosen samples are gathered
per son, computed in one vmapped forward, and combined with a segment-sum.
Static shapes, one XLA program. The math matches the reference UP TO
capacity: a son's over-capacity assignments are dropped (the reference's
dynamic loop never drops). The combine is renormalized over the surviving
weight mass so partially-dropped samples keep reference scale, and the
per-sample surviving mass is returned so the trainer can mask fully-dropped
samples out of the loss instead of training on all-zero logits.

Returns ``(combined_logits, root_choice_logits, kept_mass)`` — the root
logits feed the staged curriculum trainer (root trained on category labels
first, ``TIC/TreeViT/train.py``).

Inference (``deterministic=True``) defaults to DENSE routing: every son
runs on every sample and the top-k weights select the combination —
bit-equivalent to the reference's per-sample loop (``model.py:19-22``),
which never drops. Capacity drops are a *training* trade (static shapes
for the backward); at serving/judging a capacity-dropped sample would
return all-zero logits and be silently scored as class 0 by ``argmax`` —
single-class judge buckets (``infer/serve.py full_judge``) route nearly
the whole batch to one son and hit exactly that. ``eval_dense=False``
restores capacity dispatch at eval for cost parity with training.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import TreeViTConfig, VIT_BASE
import dataclasses

from ..ops import moe_dispatch as md
from .vit import ViT


_dense_eval_warned = False


def _warn_dense_once(num_categories: int, top_k: int) -> None:
    """Dense eval runs ALL S sons on the full batch — S/K× the son compute of
    capacity dispatch. Surface the cost factor once per process so eval/serve
    throughput changes aren't misread as kernel regressions."""
    global _dense_eval_warned
    if _dense_eval_warned:
        return
    _dense_eval_warned = True
    logging.getLogger(__name__).info(
        "TreeViT eval_dense=True: deterministic forwards run every son on the "
        "full batch (~%d/%d = %.1fx the son compute of capacity dispatch); "
        "set eval_dense=False for capacity-dispatch eval cost parity.",
        num_categories, top_k, num_categories / max(top_k, 1),
    )


class TreeViT(nn.Module):
    cfg: TreeViTConfig
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x, deterministic: bool = True, route_labels=None):
        """``route_labels`` (B,) int: teacher-forced routing — each sample is
        sent ONLY to the son of that category with weight 1. Used by the
        staged curriculum's sons stage (the TPU-parallel equivalent of the
        reference's sequential per-son training, ``TIC/TreeViT/train.py``)."""
        cfg = self.cfg
        b = x.shape[0]
        base = cfg.vit or VIT_BASE
        root_cfg = dataclasses.replace(base, num_classes=cfg.num_categories)
        son_cfg = dataclasses.replace(base, num_classes=cfg.num_classes)

        choice = ViT(root_cfg, self.compute_dtype, name="root")(
            x, deterministic=deterministic
        )                                                     # (B, S)
        if route_labels is not None:
            top_i = route_labels.reshape(b, 1).astype(jnp.int32)
            smoothed = jnp.ones((b, 1), jnp.float32)
        else:
            top_w, top_i = jax.lax.top_k(choice, cfg.top_k)   # (B, K)
            smoothed = jax.nn.softmax(top_w, axis=-1)

        SonStack = nn.vmap(
            ViT,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, None),
            out_axes=0,
            axis_size=cfg.num_categories,
            metadata_params={nn.meta.PARTITION_NAME: "expert"},
        )
        if deterministic and route_labels is None and cfg.eval_dense:
            _warn_dense_once(cfg.num_categories, cfg.top_k)
            # dense inference: (S, B, H, W, 3) — every son sees every sample,
            # weights scattered from the top-k choice. No drops, exact
            # reference combine (smoothed weights already sum to 1).
            xs = jnp.broadcast_to(x[None], (cfg.num_categories, *x.shape))
            son_logits = SonStack(son_cfg, self.compute_dtype, name="sons")(
                xs, deterministic
            )                                                  # (S, B, cls)
            w = jnp.sum(
                jax.nn.one_hot(top_i, cfg.num_categories, dtype=jnp.float32)
                * smoothed[..., None],
                axis=1,
            )                                                  # (B, S)
            combined = jnp.einsum(
                "bs,sbc->bc", w, son_logits.astype(jnp.float32))
            return combined, choice, jnp.ones((b,), jnp.float32)

        capacity = md.capacity_for(b, cfg.top_k, cfg.num_categories,
                                   cfg.capacity_factor)
        plan = md.make_dispatch_plan(top_i, cfg.num_categories, capacity)
        xs = md.dispatch(plan, x)                              # (S, C, H, W, 3)
        son_logits = SonStack(son_cfg, self.compute_dtype, name="sons")(
            xs, deterministic
        )                                                      # (S, C, classes)
        combined = md.combine(plan, son_logits.astype(jnp.float32), smoothed, b)
        kept = md.kept_mass(plan, smoothed, b)                 # (B,)
        # renormalize over the surviving weight mass: a sample that lost one
        # of its top-k copies to capacity keeps reference-scale logits
        # (weights re-softmaxed over survivors); fully-dropped stays 0
        combined = combined / jnp.maximum(kept, 1e-9)[:, None]
        return combined, choice, kept


def make_tree_vit(num_categories: int, num_classes: int, top_k: int = 2) -> TreeViT:
    """Factory parity with ``make_TreeViT`` (``TIC/TreeViT/model.py:25-30``)."""
    return TreeViT(TreeViTConfig(
        num_categories=num_categories, num_classes=num_classes, top_k=top_k,
    ))
