"""Capacity-based top-k dispatch/combine for mixture models.

The reference's MoE computes every expert densely and only *weights* sparsely
(``TIC/ResMoE/model.py:56-57``), and its TreeViT dispatches with a per-sample
Python loop (``TIC/TreeViT/model.py:19-22``) — neither survives ``jit``. This
module is the TPU-native replacement used by both: static-shape top-k routing
with expert capacity, so sparse expert compute is K/E of dense cost and the
whole thing compiles to gathers + one vmapped expert stack + a segment-sum.

Terminology: B samples, K choices/sample, E experts, capacity C slots/expert.
Assignments beyond an expert's capacity are dropped (their combine weight is
zero), matching standard capacity-factor MoE semantics.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DispatchPlan(NamedTuple):
    gather_idx: jax.Array     # (E, C) int32 — sample index feeding each slot
    slot_valid: jax.Array     # (E, C) bool  — slot actually used
    flat_expert: jax.Array    # (B*K,) int32 — expert of each assignment
    flat_pos: jax.Array       # (B*K,) int32 — slot of each assignment (clipped)
    flat_keep: jax.Array      # (B*K,) bool  — assignment survived capacity
    flat_sample: jax.Array    # (B*K,) int32 — sample of each assignment


def capacity_for(batch: int, top_k: int, num_experts: int, factor: float) -> int:
    """Static capacity: ceil(B*K/E * factor), at least 1."""
    import math

    return max(1, math.ceil(batch * top_k / num_experts * factor))


def make_dispatch_plan(
    top_k_idx: jax.Array, num_experts: int, capacity: int
) -> DispatchPlan:
    """top_k_idx: (B, K) int -> static-shape routing plan."""
    b, k = top_k_idx.shape
    flat_e = top_k_idx.reshape(-1).astype(jnp.int32)               # (BK,)
    flat_sample = (jnp.arange(b * k, dtype=jnp.int32) // k)
    onehot = jax.nn.one_hot(flat_e, num_experts, dtype=jnp.int32)  # (BK, E)
    # position of each assignment within its expert (count of earlier ones)
    before = jnp.cumsum(onehot, axis=0) - onehot
    pos = jnp.take_along_axis(before, flat_e[:, None], axis=1)[:, 0]
    keep = pos < capacity
    pos_c = jnp.where(keep, pos, capacity)                         # overflow slot

    # scatter into (E, C+1); slot C collects dropped assignments, sliced off
    gather_idx = jnp.zeros((num_experts, capacity + 1), jnp.int32)
    slot_valid = jnp.zeros((num_experts, capacity + 1), bool)
    gather_idx = gather_idx.at[flat_e, pos_c].set(flat_sample)
    slot_valid = slot_valid.at[flat_e, pos_c].set(keep)
    return DispatchPlan(
        gather_idx=gather_idx[:, :capacity],
        slot_valid=slot_valid[:, :capacity],
        flat_expert=flat_e,
        flat_pos=pos_c,
        flat_keep=keep,
        flat_sample=flat_sample,
    )


def dispatch(plan: DispatchPlan, x: jax.Array) -> jax.Array:
    """Gather per-expert inputs: x (B, ...) -> (E, C, ...)."""
    return x[plan.gather_idx]


def kept_mass(plan: DispatchPlan, weights: jax.Array, batch: int) -> jax.Array:
    """Per-sample combine mass that survived capacity: (B,) in [0, 1].

    0 means every routed copy of the sample was capacity-dropped (its
    ``combine`` output is all-zero); consumers that must not train/score on
    dropped samples (TreeViT) mask or renormalize with this."""
    w = weights.reshape(-1) * plan.flat_keep
    return jax.ops.segment_sum(w, plan.flat_sample, num_segments=batch)


def combine(
    plan: DispatchPlan,
    expert_outputs: jax.Array,   # (E, C, D)
    weights: jax.Array,          # (B, K) combine weights (softmaxed top-k)
    batch: int,
) -> jax.Array:
    """Weighted scatter-add back to samples -> (B, D)."""
    e_pad = jnp.pad(expert_outputs, ((0, 0), (0, 1), (0, 0)))      # overflow slot
    per_assign = e_pad[plan.flat_expert, plan.flat_pos]            # (BK, D)
    w = weights.reshape(-1) * plan.flat_keep                       # dropped -> 0
    per_assign = per_assign * w[:, None]
    return jax.ops.segment_sum(per_assign, plan.flat_sample, num_segments=batch)
