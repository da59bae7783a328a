"""Loss functions.

- ``cross_entropy``: CE with soft (one-hot / mixed) targets — covers both
  ``F.cross_entropy(logits, y)`` with int labels (ntrain.py:47) and the
  soft-label case after CutMix/MixUp.
- ``symmetric_cross_entropy`` + ``load_balance_loss`` + ``moe_total_loss``:
  the ResMoE objective (``TIC/ResMoE/train.py:21-36``): SCE(alpha=0.1,
  beta=1.0) plus 0.5 * a gate-usage quadratic penalty.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _weighted_mean(per_sample: jax.Array, w: jax.Array | None) -> jax.Array:
    if w is None:
        return jnp.mean(per_sample)
    w = w.astype(per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def cross_entropy(logits: jax.Array, soft_targets: jax.Array,
                  sample_weights: jax.Array | None = None) -> jax.Array:
    """Mean CE over the batch; targets are probabilities summing to 1.
    ``sample_weights`` (B,) turns it into a weighted mean (TreeViT masks
    capacity-dropped samples with it)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return _weighted_mean(-jnp.sum(soft_targets * logp, axis=-1),
                          sample_weights)


def accuracy(logits: jax.Array, labels: jax.Array, mask: jax.Array | None = None):
    """(correct_count, total_count) so callers can aggregate exactly."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels)
    if mask is not None:
        correct = correct & mask
        total = jnp.sum(mask)
    else:
        total = labels.shape[0]
    return jnp.sum(correct), total


def symmetric_cross_entropy(
    logits: jax.Array, targets: jax.Array, alpha: float = 0.1,
    beta: float = 1.0, sample_weights: jax.Array | None = None,
) -> jax.Array:
    """SCE as in ``TIC/ResMoE/train.py:21-24``: alpha*CE(logits, targets) +
    beta*reverse-CE. The reference computes the reverse term as
    -sum(softmax(logits) * log_softmax(targets)); with one-hot targets
    log_softmax of the one-hot is what the reference feeds, so we reproduce
    that exact formulation."""
    ce = cross_entropy(logits, targets, sample_weights)
    log_t = jax.nn.log_softmax(targets.astype(jnp.float32), axis=-1)
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    rce = _weighted_mean(-jnp.sum(p * log_t, axis=-1), sample_weights)
    return alpha * ce + beta * rce


def load_balance_loss(gate_weights: jax.Array) -> jax.Array:
    """Quadratic gate-usage penalty (``TIC/ResMoE/train.py:26-28``):
    mean over samples of <gate_weights_i, mean_gate_usage>."""
    avg_usage = jnp.mean(gate_weights, axis=0)              # (N,)
    return jnp.mean(gate_weights @ avg_usage)


def switch_load_balance_loss(gate_weights: jax.Array, top_idx: jax.Array,
                             num_experts: int) -> jax.Array:
    """Switch-Transformer auxiliary balance loss (Fedus et al. 2021, eq. 4;
    the standard for hard-routed TPU MoEs): ``E * sum_e f_e * P_e`` where
    ``f_e`` is the fraction of routed (sample, k) assignments landing on
    expert e (hard counts — no gradient) and ``P_e`` the mean router
    probability for e (the differentiable half). Minimized at 1.0 by a
    uniform router. Unlike the reference's quadratic usage penalty it
    couples the SELECTED assignments to the probabilities, so a
    winner-take-all gate pays a growing penalty on exactly the experts it
    overuses — measured on chip to prevent the 2-of-8 collapse the
    quadratic penalty allows (RESULTS.md cross-family section)."""
    routed = top_idx.reshape(-1)
    f = jnp.zeros((num_experts,), jnp.float32).at[routed].add(
        1.0 / routed.shape[0])
    f = jax.lax.stop_gradient(f)
    p = jnp.mean(gate_weights.astype(jnp.float32), axis=0)  # (E,)
    return num_experts * jnp.sum(f * p)


def moe_total_loss(
    logits: jax.Array,
    targets: jax.Array,
    gate_weights: jax.Array,
    balance_alpha: float = 0.5,
    sce_alpha: float = 0.1,
    sce_beta: float = 1.0,
) -> jax.Array:
    """``total_loss`` (``TIC/ResMoE/train.py:30-36``) minus the NaN asserts —
    the trainer's global non-finite guard covers those."""
    return (
        symmetric_cross_entropy(logits, targets, sce_alpha, sce_beta)
        + balance_alpha * load_balance_loss(gate_weights)
    )
