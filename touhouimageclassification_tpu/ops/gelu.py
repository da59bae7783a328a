"""erf-faithful GELU without erf: fitted activations for the TPU VPU.

The reference's ViT uses exact (erf) GELU via HF torch (delegated to CUDA's
erf — the native-dependency obligation of SURVEY §2). On TPU the VPU has no
erf instruction; XLA expands ``lax.erf`` into a long software chain. The
usual fix, tanh-approximate GELU, is ~11% faster end-to-end but changes
numerics by up to 4.7e-4 absolute (it is a *different function*, which is
why ``gelu='tanh'`` is opt-in).

Two erf-faithful alternatives, both fitted against float64 erf
(``tools/fit_gelu_poly.py``), exhaustively tested in ``tests/test_gelu.py``:

- ``gelu_poly`` — GELU(x) = x*(1/2 + x*P(x^2)) with P a degree-16
  polynomial in t = 2*x^2/R^2 - 1 (R = 5.5); pure FMA chain, max error
  8.3e-7, within 1 bf16 ulp of correctly-rounded GELU everywhere but a
  0.2% tiny-output tail. Measured on v5e: exactly as fast as XLA's erf —
  no win (kept as the highest-precision transcendental-free form and as
  documentation of that negative result).
- ``gelu_fast`` — the production choice; see its comment below.
"""
from __future__ import annotations

import jax.numpy as jnp

_R = 5.5
# Monomial coefficients (ascending) in t = 2*x^2/R^2 - 1 of the degree-16
# Chebyshev least-squares fit of (Phi(x) - 1/2)/x, weight x/sqrt(|gelu(-x)|
# + 1e-7) (tail-emphasized so the negative branch, where the output is
# smallest, carries the accuracy). Fit script: tools/fit_gelu_poly.py.
_COEF = (
    0.12855193298197057,
    -0.06417232937586051,
    0.04773734834885132,
    -0.03879305635335889,
    0.03207620097612754,
    -0.026046417026220056,
    0.020317484268661368,
    -0.015001739456608846,
    0.010407231289244267,
    -0.006830033764773152,
    0.004257539276292688,
    -0.0023820962685757955,
    0.001122457124629181,
    -0.0005697105941221834,
    0.00040429761935076406,
    -0.000221164228774355,
    5.114266451739816e-05,
)


# gelu_fast: v5e's VPU executes tanh as a fast APPROXIMATE instruction
# (measured on chip: f32 max abs err 4.4e-5, rel 8.1e-5) — which is why
# tanh-GELU runs ~11% faster train steps than erf-GELU while the FMA-only
# polynomial above, despite being erf-exact, is exactly as slow as erf
# (tools/bench_gelu.py). The fastest erf-faithful activation on this
# hardware therefore keeps the tanh STRUCTURE and fixes its ARGUMENT:
#
#     GELU(x) = 0.5*x*(1 + tanh(atanh(2*Phi(x) - 1)))      exactly,
#
# and atanh(2*Phi(x)-1) is an odd, polynomial-friendly function (grows
# ~x^2/4, and tanh saturation forgives tail error). A degree-13 odd fit
# x*Q(x^2) (7 coefficients, Gauss-Newton on the true GELU error of both
# branches, tail-weighted; tools/fit_gelu_poly.py --fast) gives max GELU
# error 1.5e-6 in exact-tanh arithmetic — 300x closer to erf-GELU than
# the conventional tanh approximation (4.7e-4) at the same instruction
# cost (+4 FMAs). On the TPU the hardware tanh's own 4.4e-5 then bounds
# the on-device deviation: still ~10x closer to erf than 'tanh'.
_R_FAST = 6.0
_COEF_FAST = (  # monomial in t = 2*x^2/R^2 - 1, ascending
    1.3451626710780278,
    0.4417491074986565,
    -0.08139616524138601,
    0.016303565801233915,
    1.0984265175959657e-05,
    0.04577271843402655,
    0.03791210428240511,
)


# Gradient safety vs hot-path cost. Beyond the fit radius the Horner chain
# eventually overflows to inf; the primal stays finite (the wheres select
# the identity/zero branch and tanh saturates), but once the chain is inf,
# reverse-mode where() multiplies cotangent 0 by an inf-derivative → NaN.
# The two variants make DIFFERENT trades, both measured on chip:
#
# - gelu_fast (the production default): the degree-6 chain in t only
#   overflows f32 at |x| ≈ 8.6e3 — a pre-activation four orders past the
#   fit radius, i.e. a model that has already catastrophically diverged,
#   which the trainer's fused NaN-guard (train/optim.fast_global_norm)
#   exists to absorb: the non-finite update is skipped either way. Guarding
#   the activation itself was measured at 4.3% of the WHOLE train step
#   (319.1 → 305.3 img/s back-to-back, both as a primal clamp and as a
#   custom_jvp clamped-derivative rule — either way the clipped copy
#   becomes one more live f32 (B, N, 4C) tensor on the backward). The
#   default therefore ships clamp-free; tests pin finite gradients through
#   |x| = 5e3.
#
# - gelu_poly (non-default, erf-exact documentation form): the degree-16
#   chain overflows already at |x| ≈ 84, which unstable-but-recoverable
#   training can reach. It keeps the input clamp (double-where); its speed
#   is irrelevant since it measured no faster than XLA's erf anyway.


def gelu_fast(x: jnp.ndarray) -> jnp.ndarray:
    """erf-GELU via the VPU's fast tanh with a fitted argument polynomial
    (max err 1.5e-6 + the backend tanh's own error; see module comment)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    u = xf * xf
    t = u * jnp.float32(2.0 / (_R_FAST * _R_FAST)) - jnp.float32(1.0)
    acc = jnp.float32(_COEF_FAST[-1])
    for c in _COEF_FAST[-2::-1]:
        acc = acc * t + jnp.float32(c)
    y = jnp.float32(0.5) * xf * (jnp.float32(1.0) + jnp.tanh(xf * acc))
    y = jnp.where(xf > jnp.float32(_R_FAST), xf, y)
    y = jnp.where(xf < jnp.float32(-_R_FAST), jnp.float32(0.0), y)
    return y.astype(dtype)


def gelu_poly(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-GELU to 8.3e-7 absolute via one odd polynomial; returns x's
    dtype, internal arithmetic in f32 (like XLA's own erf path for bf16)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xc = jnp.clip(xf, -_R, _R)  # double-where (see module comment above)
    u = xc * xc
    t = u * jnp.float32(2.0 / (_R * _R)) - jnp.float32(1.0)
    acc = jnp.float32(_COEF[-1])
    for c in _COEF[-2::-1]:
        acc = acc * t + jnp.float32(c)
    y = xc * (jnp.float32(0.5) + xc * acc)
    # outside |x| <= R the polynomial is not fitted: GELU(x) is x (resp. 0)
    # to well below bf16 resolution there (|x*Phi(-|x|)| < 1.1e-7 at R)
    y = jnp.where(xf > jnp.float32(_R), xf, y)
    y = jnp.where(xf < jnp.float32(-_R), jnp.float32(0.0), y)
    return y.astype(dtype)
