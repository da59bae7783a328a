"""MoE dispatch op, ResMoE (dense vs sparse parity), TreeViT, and losses."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touhouimageclassification_tpu.config import MoEConfig, TreeViTConfig, ViTConfig
from touhouimageclassification_tpu.models.resmoe import MoEClassifier
from touhouimageclassification_tpu.models.treevit import TreeViT
from touhouimageclassification_tpu.ops import moe_dispatch as md
from touhouimageclassification_tpu.train import losses

TINY_VIT = ViTConfig(image_size=16, patch_size=8, hidden_size=16, num_layers=1,
                     num_heads=2, mlp_dim=32, num_classes=6)


# ---------------------------------------------------------------------------
# dispatch op
# ---------------------------------------------------------------------------

def test_dispatch_roundtrip_identity():
    """With enough capacity, dispatch+combine with weight 1 on k=1 routing is
    a permutation-invariant identity."""
    b, e = 8, 4
    top_i = jnp.array([[i % e] for i in range(b)])       # (B, 1)
    plan = md.make_dispatch_plan(top_i, e, capacity=md.capacity_for(b, 1, e, 2.0))
    x = jnp.arange(b * 3, dtype=jnp.float32).reshape(b, 3)
    gathered = md.dispatch(plan, x)                      # (E, C, 3)
    out = md.combine(plan, gathered, jnp.ones((b, 1)), b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_dispatch_capacity_drops():
    """All samples to one expert with capacity 2 -> only 2 survive."""
    b = 6
    top_i = jnp.zeros((b, 1), jnp.int32)
    plan = md.make_dispatch_plan(top_i, num_experts=3, capacity=2)
    assert int(plan.flat_keep.sum()) == 2
    assert bool(plan.slot_valid[0].all())
    assert not bool(plan.slot_valid[1:].any())
    x = jnp.ones((b, 4))
    out = md.combine(plan, md.dispatch(plan, x), jnp.ones((b, 1)), b)
    # dropped samples get zero output
    assert int((np.asarray(out).sum(axis=1) > 0).sum()) == 2


def test_dispatch_weights_applied():
    b, e, k = 4, 2, 2
    top_i = jnp.tile(jnp.array([[0, 1]]), (b, 1))
    w = jnp.tile(jnp.array([[0.75, 0.25]]), (b, 1))
    plan = md.make_dispatch_plan(top_i, e, capacity=b)
    xs = md.dispatch(plan, jnp.ones((b, 1)))
    out = md.combine(plan, xs, w, b)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)  # 0.75+0.25


# ---------------------------------------------------------------------------
# ResMoE
# ---------------------------------------------------------------------------

def _moe(routing, capacity_factor=8.0):
    return MoEClassifier(MoEConfig(
        num_experts=4, top_k=2, num_classes=6, routing=routing,
        capacity_factor=capacity_factor, expert_vit=TINY_VIT,
    ), compute_dtype="float32")


def test_moe_dense_forward_shapes():
    model = _moe("dense")
    x = jax.random.normal(jax.random.key(0), (3, 16, 16, 3))
    params = model.init(jax.random.key(1), x)
    logits, gate_dense, top_i = model.apply(params, x)
    assert logits.shape == (3, 6)
    assert gate_dense.shape == (3, 4)
    assert top_i.shape == (3, 2)
    # dense gate rows sum to 1 (softmaxed top-k scattered)
    np.testing.assert_allclose(np.asarray(gate_dense.sum(-1)), 1.0, atol=1e-5)


def test_moe_sparse_matches_dense_with_ample_capacity():
    """With capacity >= B*K, sparse dispatch computes exactly the chosen
    experts; dense weights the unchosen ones with 0 — results must match."""
    dense = _moe("dense")
    sparse = _moe("sparse", capacity_factor=16.0)
    x = jax.random.normal(jax.random.key(0), (4, 16, 16, 3))
    params = dense.init(jax.random.key(1), x)
    out_d, gd, ti_d = dense.apply(params, x)
    out_s, gs, ti_s = sparse.apply(params, x)
    np.testing.assert_array_equal(np.asarray(ti_d), np.asarray(ti_s))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d), atol=1e-4,
                               rtol=1e-4)


def test_moe_feature_dispatch_matches_image_dispatch():
    """Feature-level dispatch (gather token sequences after per-expert patch
    embed) computes the same function as image-level dispatch (gather raw
    images), with an identical param tree."""
    feat = _moe("sparse")        # dispatch_level defaults to 'feature'
    img = MoEClassifier(MoEConfig(
        num_experts=4, top_k=2, num_classes=6, routing="sparse",
        capacity_factor=8.0, dispatch_level="image", expert_vit=TINY_VIT,
    ), compute_dtype="float32")
    x = jax.random.normal(jax.random.key(0), (4, 16, 16, 3))
    params = img.init(jax.random.key(1), x)
    out_i, gi, ti_i = img.apply(params, x)
    out_f, gf, ti_f = feat.apply(params, x)
    np.testing.assert_array_equal(np.asarray(ti_i), np.asarray(ti_f))
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_i),
                               atol=1e-4, rtol=1e-4)


def test_moe_gate_noise_only_in_training():
    model = _moe("dense")
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    params = model.init(jax.random.key(1), x)
    a1, *_ = model.apply(params, x, deterministic=True)
    a2, *_ = model.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    b1, *_ = model.apply(params, x, deterministic=False,
                         rngs={"gate": jax.random.key(2), "dropout": jax.random.key(3)})
    assert np.isfinite(np.asarray(b1)).all()


def test_moe_losses():
    logits = jax.random.normal(jax.random.key(0), (4, 6))
    targets = jax.nn.one_hot(jnp.array([0, 1, 2, 3]), 6)
    gate = jax.nn.softmax(jax.random.normal(jax.random.key(1), (4, 4)))
    total = losses.moe_total_loss(logits, targets, gate)
    assert np.isfinite(float(total))
    # balanced gates minimize the load-balance term among distributions
    uniform = jnp.full((4, 4), 0.25)
    skewed = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (4, 1))
    assert float(losses.load_balance_loss(uniform)) < float(
        losses.load_balance_loss(skewed))


def test_moe_task_routing_telemetry():
    """Sparse MoETask.loss emits drop_frac/expert_load_* aux telemetry with
    the dispatch plan's exact capacity semantics (train/tasks.py)."""
    from touhouimageclassification_tpu.train.tasks import MoETask

    b, e, k = 8, 4, 2
    cfg = MoEConfig(num_experts=e, top_k=k, routing="sparse",
                    capacity_factor=1.0, num_classes=6, expert_vit=TINY_VIT)
    task = MoETask(cfg)
    logits = jax.random.normal(jax.random.key(0), (b, 6))
    targets = jax.nn.one_hot(jnp.arange(b) % 6, 6)
    gate = jax.nn.softmax(jax.random.normal(jax.random.key(1), (b, e)))

    # everything routed to expert 0: capacity = B*K/E*1.0 = 4 slots, so
    # 16 routed copies lose 12 and expert 0 carries 100% of the load
    top_all0 = jnp.zeros((b, k), jnp.int32)
    _, aux = task.loss((logits, gate, top_all0), targets)
    cap = md.capacity_for(b, k, e, cfg.capacity_factor)
    assert float(aux["drop_frac"]) == pytest.approx((b * k - cap) / (b * k))
    assert float(aux["expert_load_max"]) == pytest.approx(1.0)
    assert float(aux["expert_load_min"]) == pytest.approx(0.0)

    # perfectly balanced routing at factor 1.0 drops nothing
    top_bal = (jnp.arange(b * k).reshape(b, k)) % e
    _, aux = task.loss((logits, gate, top_bal), targets)
    assert float(aux["drop_frac"]) == 0.0
    assert float(aux["expert_load_max"]) == pytest.approx(1.0 / e)
    assert float(aux["expert_load_min"]) == pytest.approx(1.0 / e)

    # dense routing emits no telemetry keys (nothing is dispatched)
    dense = MoETask(dataclasses.replace(cfg, routing="dense"))
    _, aux = dense.loss((logits, gate, top_all0), targets)
    assert "drop_frac" not in aux


# ---------------------------------------------------------------------------
# TreeViT
# ---------------------------------------------------------------------------

def test_treevit_forward_and_grads():
    model = TreeViT(TreeViTConfig(
        num_categories=3, num_classes=6, top_k=2, capacity_factor=8.0,
        vit=TINY_VIT,
    ), compute_dtype="float32")
    x = jax.random.normal(jax.random.key(0), (4, 16, 16, 3))
    params = model.init(jax.random.key(1), x)
    combined, choice, kept = model.apply(params, x)
    assert combined.shape == (4, 6)
    assert choice.shape == (4, 3)

    def loss_fn(p):
        c, ch, _ = model.apply(p, x)
        return jnp.sum(c ** 2) + jnp.sum(ch ** 2)

    g = jax.jit(jax.grad(loss_fn))(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_treevit_capacity_path_grads():
    """Gradient coverage through the CAPACITY dispatch/combine/renormalize
    path (eval_dense=True reroutes deterministic forwards through the dense
    branch, so this pins the segment-sum combine's backward — including with
    real capacity drops — which no other test differentiates)."""
    cfg = TreeViTConfig(num_categories=3, num_classes=6, top_k=2,
                        capacity_factor=8.0, vit=TINY_VIT, eval_dense=False)
    model = TreeViT(cfg, compute_dtype="float32")
    x = jax.random.normal(jax.random.key(0), (4, 16, 16, 3))
    params = model.init(jax.random.key(1), x)

    def make_loss(m):
        def loss_fn(p):
            c, ch, kept = m.apply(p, x)
            return jnp.sum(c ** 2) + jnp.sum(ch ** 2) + jnp.sum(kept)
        return loss_fn

    g = jax.jit(jax.grad(make_loss(model)))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # the sons actually receive gradient through the dispatch
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)

    # and with real drops (capacity 1 per son): backward stays finite
    cfg_drop = dataclasses.replace(cfg, capacity_factor=0.5, top_k=1)
    model_drop = TreeViT(cfg_drop, compute_dtype="float32")
    params_drop = model_drop.init(jax.random.key(2), x)
    g2 = jax.jit(jax.grad(make_loss(model_drop)))(params_drop)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g2))


def test_treevit_jits():
    model = TreeViT(TreeViTConfig(num_categories=2, num_classes=4, top_k=1,
                                  vit=TINY_VIT))
    x = jnp.ones((2, 16, 16, 3))
    params = model.init(jax.random.key(0), x)
    fn = jax.jit(lambda p, x: model.apply(p, x))
    combined, choice, _kept = fn(params, x)
    assert combined.shape == (2, 4)


def test_treevit_capacity_drop_masked_and_renormalized():
    """Over-capacity samples: fully-dropped ones report kept=0 (the staged
    trainer masks them out of the loss); partially-dropped ones are
    renormalized; no-drop batches report kept==1 and match the reference
    combine exactly."""
    from touhouimageclassification_tpu.train.tasks import TreeSonsTask
    from touhouimageclassification_tpu.config import TreeViTConfig

    # tiny capacity: B=4, K=1, S=2, factor 0.5 -> capacity 1 per son
    cfg = TreeViTConfig(num_categories=2, num_classes=4, top_k=1,
                        capacity_factor=0.5, vit=TINY_VIT)
    model = TreeViT(cfg, compute_dtype="float32")
    x = jax.random.normal(jax.random.key(0), (4, 16, 16, 3))
    params = model.init(jax.random.key(1), x)
    # teacher-force every sample to son 0: capacity 1 keeps exactly one
    route = jnp.zeros((4,), jnp.int32)
    combined, _choice, kept = model.apply(params, x, True,
                                          route_labels=route)
    assert int(jnp.sum(kept > 0)) == 1, "capacity 1 keeps one sample"
    dropped = np.asarray(kept) == 0
    assert not np.asarray(combined)[dropped].any(), "dropped -> zero logits"

    # the loss must ignore the dropped samples (finite, driven by the kept
    # one) and report the drop fraction
    task = TreeSonsTask(cfg, np.array([0, 0, 1, 1], np.int32))
    labels = jax.nn.one_hot(jnp.array([0, 1, 2, 3]), 4)
    loss, aux = task.loss((combined, _choice, kept), labels)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(aux["dropped_frac"]), 0.75)

    # ample capacity: kept mass is exactly 1 for every sample
    cfg2 = TreeViTConfig(num_categories=2, num_classes=4, top_k=2,
                         capacity_factor=8.0, vit=TINY_VIT)
    model2 = TreeViT(cfg2, compute_dtype="float32")
    params2 = model2.init(jax.random.key(2), x)
    _c, _ch, kept2 = model2.apply(params2, x)
    np.testing.assert_allclose(np.asarray(kept2), 1.0, atol=1e-6)


def test_treevit_dense_eval_matches_ample_capacity_and_never_drops():
    """Deterministic (serve/judge) forwards default to DENSE routing: kept
    is exactly 1 for every sample even when the training capacity would
    drop most of a skewed batch (a dropped sample at serve time argmaxes
    all-zero logits to class 0 — the full_judge per-class walk makes every
    bucket single-class, i.e. maximally skewed). The dense combine must
    agree with the capacity combine when capacity is ample (same math,
    different dispatch)."""
    import dataclasses

    cfg = TreeViTConfig(num_categories=4, num_classes=6, top_k=2,
                        capacity_factor=0.25, vit=TINY_VIT)
    model = TreeViT(cfg, compute_dtype="float32")
    x = jax.random.normal(jax.random.key(0), (8, 16, 16, 3))
    params = model.init(jax.random.key(1), x)

    combined_d, _choice, kept_d = model.apply(params, x)  # eval default
    np.testing.assert_allclose(np.asarray(kept_d), 1.0, atol=0)
    assert np.abs(np.asarray(combined_d)).sum() > 0

    # the same weights through the capacity path at eval: B=8,K=2,S=4 at
    # factor 0.25 -> capacity 1 per son, 16 routed copies, at most 4 kept
    cfg_cap = dataclasses.replace(cfg, eval_dense=False)
    _c, _ch, kept_cap = TreeViT(cfg_cap, compute_dtype="float32").apply(
        params, x)
    assert np.any(np.asarray(kept_cap) < 1.0), "tiny capacity must drop"

    # ample capacity (factor = S covers B*K per son): no drops, and the
    # gather/segment-sum combine equals the dense einsum combine
    cfg_amp = dataclasses.replace(cfg, eval_dense=False,
                                  capacity_factor=float(cfg.num_categories))
    c_amp, _ch2, kept_amp = TreeViT(cfg_amp, compute_dtype="float32").apply(
        params, x)
    np.testing.assert_allclose(np.asarray(kept_amp), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_amp), np.asarray(combined_d),
                               rtol=1e-4, atol=1e-5)


def test_switch_balance_loss_math():
    """Switch aux loss (losses.switch_load_balance_loss): 1.0 at a uniform
    router, grows toward E under collapse, and its gradient pushes the
    router's probability mass OFF the overloaded experts (the property the
    reference's quadratic penalty lacks on selected-assignment collapse)."""
    E, B, K = 4, 8, 2
    uniform = jnp.full((B, E), 1.0 / E)
    # a perfectly balanced hard assignment
    balanced_idx = jnp.array([[i % E, (i + 1) % E] for i in range(B)])
    val_u = float(losses.switch_load_balance_loss(uniform, balanced_idx, E))
    np.testing.assert_allclose(val_u, 1.0, rtol=1e-6)

    # collapse: all assignments AND all probability on experts {0, 1}
    coll_gate = jnp.tile(jnp.array([[0.5, 0.5, 0.0, 0.0]]), (B, 1))
    coll_idx = jnp.tile(jnp.array([[0, 1]]), (B, 1))
    val_c = float(losses.switch_load_balance_loss(coll_gate, coll_idx, E))
    assert val_c == pytest.approx(E / 2, rel=1e-6)  # f=p=1/2 on two experts
    assert val_c > val_u

    # gradient direction: d(loss)/d(gate prob) is positive exactly on the
    # overloaded experts -> gradient descent reduces their router mass
    g = jax.grad(lambda gw: losses.switch_load_balance_loss(
        gw, coll_idx, E))(coll_gate)
    g = np.asarray(g)
    assert (g[:, :2] > 0).all() and (g[:, 2:] == 0).all()


def test_moe_task_switch_balance_wiring():
    """MoETask picks the switch loss when the config asks for it."""
    import dataclasses

    from touhouimageclassification_tpu.config import MoEConfig
    from touhouimageclassification_tpu.train.tasks import MoETask

    cfg = MoEConfig(num_experts=4, top_k=2, routing="sparse",
                    num_classes=6, balance_loss="switch",
                    balance_loss_alpha=1.0)
    task = MoETask(cfg)
    logits = jax.random.normal(jax.random.key(0), (8, 6))
    targets = jax.nn.one_hot(jnp.arange(8) % 6, 6)
    coll_gate = jnp.tile(jnp.array([[0.5, 0.5, 0.0, 0.0]]), (8, 1))
    coll_idx = jnp.tile(jnp.array([[0, 1]]), (8, 1))
    total_sw, aux_sw = task.loss((logits, coll_gate, coll_idx), targets)
    # switch penalty on this collapse is E/2 = 2 ...
    assert float(aux_sw["balance_loss"]) == pytest.approx(2.0, rel=1e-5)
    # ... while the quadratic penalty reads sum(p_e^2) = 0.5
    quad_task = MoETask(dataclasses.replace(cfg, balance_loss="quadratic"))
    _, aux_q = quad_task.loss((logits, coll_gate, coll_idx), targets)
    assert float(aux_q["balance_loss"]) == pytest.approx(0.5, rel=1e-5)


def test_gate_for_loss_view_depends_on_balance_loss():
    """With balance_loss='switch' the model's second output is the FULL
    router softmax (mass and gradient on unselected experts); with the
    reference 'quadratic' it stays the scattered top-k weights (zeros
    outside the selection) — the structural difference behind the
    collapse study (models/resmoe.py GatingNetwork)."""
    import dataclasses

    from touhouimageclassification_tpu.config import MoEConfig, ViTConfig
    from touhouimageclassification_tpu.models.resmoe import MoEClassifier

    tiny = ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                     num_layers=1, num_heads=2, mlp_dim=64, num_classes=5)
    base = MoEConfig(num_experts=4, top_k=2, routing="sparse",
                     num_classes=5, expert_vit=tiny)
    x = jax.random.normal(jax.random.key(0), (8, 32, 32, 3))

    quad = MoEClassifier(base, compute_dtype="float32")
    params = quad.init(jax.random.key(1), x)
    _, gate_q, top_q = quad.apply(params, x)
    # scattered top-k: exactly K nonzeros per row, rows sum to 1
    assert int(np.count_nonzero(np.asarray(gate_q), axis=1).max()) <= 2
    np.testing.assert_allclose(np.asarray(gate_q).sum(1), 1.0, rtol=1e-5)

    sw = MoEClassifier(dataclasses.replace(base, balance_loss="switch"),
                       compute_dtype="float32")
    logits_s, gate_s, top_s = sw.apply(params, x)  # same params apply
    g = np.asarray(gate_s)
    np.testing.assert_allclose(g.sum(1), 1.0, rtol=1e-5)
    # full softmax: every expert carries probability mass
    assert (g > 0).all()
    # the combine itself is unchanged by the loss view
    logits_q, _, _ = quad.apply(params, x)
    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(logits_q),
                               rtol=1e-5, atol=1e-6)
