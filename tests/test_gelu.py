"""ops/gelu.py: the polynomial exact-GELU must match erf-GELU to the
documented bounds — exhaustively over every finite bf16 input."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touhouimageclassification_tpu.ops.gelu import gelu_fast, gelu_poly


def _gelu_truth(x64: np.ndarray) -> np.ndarray:
    from scipy.special import erf

    return x64 * 0.5 * (1.0 + erf(x64 / math.sqrt(2.0)))


def test_f32_max_abs_error():
    x = np.linspace(-8, 8, 500_001)
    out = np.asarray(gelu_poly(jnp.asarray(x, jnp.float32)), np.float64)
    err = np.abs(out - _gelu_truth(x))
    assert err.max() < 1.5e-6, err.max()
    # and it must dominate the tanh approximation by orders of magnitude
    tanh = np.asarray(
        jax.nn.gelu(jnp.asarray(x, jnp.float32), approximate=True), np.float64
    )
    assert err.max() < 0.01 * np.abs(tanh - _gelu_truth(x)).max()


def test_every_bf16_input_within_one_ulp():
    """All 65280 finite bf16 inputs, compared against XLA's own exact
    (erf) GELU on the same backend: outputs agree in bf16 except
    (a) a small set of 1-ulp rounding flips, all at tail outputs with
    |y| < 3e-3 — the region where f32 erf-GELU itself loses relative
    accuracy to cancellation in (1 + erf(x/sqrt(2))) — and
    (b) sub-1e-8 outputs flushed to zero by the |x| > 5.5 clamp."""
    ml_dtypes = pytest.importorskip("ml_dtypes")

    bf = np.arange(65536, dtype=np.uint16).view(ml_dtypes.bfloat16)
    with np.errstate(invalid="ignore"):
        finite = np.isfinite(bf.astype(np.float32))
    xf = jnp.asarray(bf[finite].astype(np.float32))

    ours = np.asarray(gelu_poly(xf)).astype(ml_dtypes.bfloat16)
    ref = np.asarray(jax.nn.gelu(xf, approximate=False)).astype(
        ml_dtypes.bfloat16
    )

    mism = ours != ref
    assert mism.sum() <= 700, mism.sum()
    ref_m = ref[mism].astype(np.float64)
    ours_m = ours[mism].astype(np.float64)
    # (b) tail outputs (|y| < 1e-5, i.e. |x| > ~4.3): relative accuracy is
    # not well-defined for EITHER impl there (f32 cancellation in
    # 1 + erf(x/sqrt(2))); both agree within the poly's absolute bound
    tiny = np.abs(ref_m) < 1e-5
    assert np.abs(ours_m[tiny] - ref_m[tiny]).max(initial=0.0) < 2e-6
    # (a) everywhere the output is representable at bf16 relative accuracy:
    # same sign, at most two representable steps apart (2 ulp occurs once,
    # just above the 1e-5 cut), small in magnitude
    if (~tiny).any():
        r_b = ref[mism][~tiny]
        o_b = ours[mism][~tiny]
        assert np.abs(ref_m[~tiny]).max() < 3e-3
        assert np.all(np.sign(ref_m[~tiny]) == np.sign(ours_m[~tiny]))
        diff = np.abs(r_b.view(np.uint16).astype(np.int64)
                      - o_b.view(np.uint16).astype(np.int64))
        assert diff.max() <= 2, diff.max()


def test_fast_max_abs_error():
    """gelu_fast: erf-GELU to ~1.5e-6 in exact-tanh arithmetic, plus the
    backend tanh's own error (f32 software tanh here; the v5e hardware tanh
    adds up to 4.4e-5 — still 10x closer to erf than the conventional tanh
    approximation's 4.7e-4)."""
    x = np.linspace(-9, 9, 500_001)
    out = np.asarray(gelu_fast(jnp.asarray(x, jnp.float32)), np.float64)
    err = np.abs(out - _gelu_truth(x))
    backend_tanh_budget = 5e-5 if jax.default_backend() != "cpu" else 3e-6
    assert err.max() < backend_tanh_budget, err.max()
    tanh = np.asarray(
        jax.nn.gelu(jnp.asarray(x, jnp.float32), approximate=True), np.float64
    )
    assert err.max() < 0.12 * np.abs(tanh - _gelu_truth(x)).max()


def test_fast_gradient_is_finite_and_close():
    x = jnp.linspace(-9.0, 9.0, 10_001, dtype=jnp.float32)
    g_fast = jax.vmap(jax.grad(lambda v: gelu_fast(v)))(x)
    g_ref = jax.vmap(jax.grad(lambda v: jax.nn.gelu(v, approximate=False)))(x)
    assert bool(jnp.all(jnp.isfinite(g_fast)))
    assert float(jnp.max(jnp.abs(g_fast - g_ref))) < 2e-4


def test_gradient_is_finite_and_close():
    x = jnp.linspace(-8.0, 8.0, 10_001, dtype=jnp.float32)
    g_poly = jax.vmap(jax.grad(lambda v: gelu_poly(v)))(x)
    g_ref = jax.vmap(jax.grad(lambda v: jax.nn.gelu(v, approximate=False)))(x)
    assert bool(jnp.all(jnp.isfinite(g_poly)))
    assert float(jnp.max(jnp.abs(g_poly - g_ref))) < 5e-5


@pytest.mark.parametrize("variant", ["poly", "fast"])
def test_model_flag_matches_exact(variant):
    """ViT forward with gelu='poly'/'fast' matches gelu='exact' to bf16
    tolerance."""
    import dataclasses

    from touhouimageclassification_tpu.config import ViTConfig
    from touhouimageclassification_tpu.models.vit import ViT

    cfg = ViTConfig(
        image_size=32, patch_size=16, hidden_size=64, num_layers=2,
        num_heads=4, mlp_dim=128, num_classes=7,
    )
    x = jax.random.normal(jax.random.key(1), (2, cfg.image_size, cfg.image_size, 3))
    exact = ViT(cfg)
    params = exact.init(jax.random.key(0), x)["params"]
    le = exact.apply({"params": params}, x)
    lp = ViT(dataclasses.replace(cfg, gelu=variant)).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(le), np.asarray(lp), atol=2e-2, rtol=0)


def test_gradients_finite_at_extreme_inputs():
    """gelu_poly is input-clamped: gradients finite for ALL x (its degree-16
    chain overflows already at |x|~84, reachable in unstable training).
    gelu_fast deliberately ships clamp-free (the guard measured 4.3% of the
    train step); its degree-6 chain is finite through |x| ~ 8.6e3, so pin
    finite gradients over the whole plausibly-reachable range."""
    x_all = jnp.asarray([-1e6, -1e4, -100.0, 100.0, 1e4, 1e6], jnp.float32)
    g = jax.vmap(jax.grad(gelu_poly))(x_all)
    assert bool(jnp.all(jnp.isfinite(g))), g
    x_fast = jnp.asarray([-5e3, -100.0, -50.0, 50.0, 100.0, 5e3], jnp.float32)
    g = jax.vmap(jax.grad(gelu_fast))(x_fast)
    assert bool(jnp.all(jnp.isfinite(g))), g
    # and the forwards stay exact out there: identity / zero — for BOTH,
    # at any magnitude (the primal never produces inf/NaN)
    np.testing.assert_array_equal(np.asarray(gelu_poly(x_all)),
                                  [0, 0, 0, 100.0, 1e4, 1e6])
    np.testing.assert_array_equal(np.asarray(gelu_fast(x_all)),
                                  [0, 0, 0, 100.0, 1e4, 1e6])


def test_unknown_variant_raises():
    import dataclasses

    from touhouimageclassification_tpu.config import ViTConfig
    from touhouimageclassification_tpu.models.vit import ViT

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                    num_layers=1, num_heads=4, mlp_dim=128, num_classes=3,
                    gelu="fats")
    x = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(ValueError, match="gelu"):
        ViT(cfg, compute_dtype="float32").init(jax.random.key(0), x)
