"""Vision Transformer, TPU-first.

Capability parity with the reference's HF-ViT wrapper (``TIC/ViT/model.py:8-47``:
ViT-Base/Large patch16-224, resized classification head, scratch-init path),
re-designed for the MXU rather than translated:

- patch embedding is space-to-depth + one big matmul (maps straight onto the
  MXU; mathematically identical to the stride-16 conv HF uses), with an
  optional fused Pallas kernel (``ops/patch_embed.py``),
- attention uses a fused QKV projection and can dispatch to a Pallas
  flash-attention kernel (``ops/attention.py``) or a plain XLA path,
- parameters are float32, compute is bfloat16 (bf16-mixed analogue of
  ``ntrain.py:241`` without GradScaler — bf16 needs no loss scaling),
- all shapes are static; the whole forward jits to a single XLA program.

The parameter tree is kept HF-convertible: ``utils/convert.py`` maps
``google/vit-*`` torch checkpoints onto it bit-exactly (fused QKV = concat of
HF q/k/v; patch kernel = transposed conv kernel).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ViTConfig
from ..ops.gelu import gelu_fast, gelu_poly


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class _Proj(nn.Module):
    """Parameter holder for the patch projection (scoped so the tree is
    ``patch_embed/proj/{kernel,bias}`` on both the XLA and Pallas paths,
    matching what the converter produces)."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.out_features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_features,), jnp.float32)
        return kernel, bias


class PatchEmbed(nn.Module):
    """Space-to-depth + projection. Equivalent to Conv(kernel=P, stride=P).

    Input NHWC (B, S, S, 3) -> (B, N, hidden). The unfold order is
    (ph, pw, c) to match a conv kernel laid out (Ph, Pw, C, O), which is what
    the HF->flax converter produces from torch OIHW weights. With
    ``cfg.patch_embed_impl == 'pallas'`` the unfold+matmul runs as one fused
    kernel (``ops/patch_embed.py``); params are identical either way.
    """

    cfg: ViTConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        p = cfg.patch_size
        b, h, w, c = x.shape
        kernel, bias = _Proj(p * p * c, cfg.hidden_size, name="proj")()
        if cfg.patch_embed_impl == "pallas":
            from ..ops.patch_embed import pallas_patch_embed

            return pallas_patch_embed(
                x, kernel.astype(self.dtype), bias.astype(self.dtype), p
            )
        gh, gw = h // p, w // p
        x = x.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)          # (B, gh, gw, p, p, c)
        x = x.reshape(b, gh * gw, p * p * c)
        return x @ kernel.astype(self.dtype) + bias.astype(self.dtype)


class Attention(nn.Module):
    """Multi-head self-attention with fused QKV.

    ``impl='flash'`` dispatches to the Pallas TPU kernel; ``'xla'`` is the
    plain (already MXU-friendly) einsum path with f32 softmax.
    """

    cfg: ViTConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        d = cfg.hidden_size
        nh = cfg.num_heads
        hd = d // nh
        b, n, _ = x.shape

        qkv = nn.Dense(3 * d, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)

        if cfg.attention_impl == "fused" and cfg.attention_dropout_rate == 0.0:
            # the slab kernel consumes the fused-QKV (B, N, 3C) projection
            # output DIRECTLY: no lane slicing (which materializes three
            # (B, N, C) copies per layer), no (B, N, H, D) reshape glue, and
            # one fused (B, N, 3C) gradient on the way back. Measured 329 vs
            # 319 img/s for the sliced three-operand form at the full step
            # (an earlier comparison that read the opposite was confounded
            # by a GELU input clamp — see ops/gelu.py). (attention dropout
            # falls through to the XLA path below; every reference config
            # uses rate 0.0.)
            from ..ops.attention import packed_attention_slab_auto

            out = packed_attention_slab_auto(qkv, nh)         # (B, N, C)
            return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                            name="out")(out)

        qkv = qkv.reshape(b, n, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # (B, N, nh, hd)

        if cfg.attention_impl == "flash":
            if cfg.attention_dropout_rate > 0.0:
                raise ValueError(
                    "attention_impl='flash' does not support "
                    "attention_dropout_rate > 0; use 'xla'"
                )
            from ..ops.attention import flash_attention

            out = flash_attention(q, k, v)                    # (B, N, nh, hd)
        elif cfg.attention_impl == "xla_remat":
            # XLA forward, recomputed in backward: the (B, nh, N, N)
            # probabilities are never stored for the backward pass, removing
            # ~160 MB/layer of activation residuals (and the auto-remat
            # pressure they cause) at the cost of one extra attention fwd.
            # No attention-dropout support on this path (the reference uses
            # rate 0.0 everywhere).
            if cfg.attention_dropout_rate > 0.0:
                raise ValueError(
                    "attention_impl='xla_remat' does not support "
                    "attention_dropout_rate > 0; use 'xla'"
                )
            from ..ops.attention import _reference_attention

            out = jax.checkpoint(_reference_attention)(q, k, v)
        elif cfg.attention_impl in ("xla", "fused"):
            # 'fused' lands here only with attention_dropout_rate > 0
            scale = hd ** -0.5
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            probs = probs.astype(self.dtype)
            if cfg.attention_dropout_rate > 0.0 and not deterministic:
                probs = nn.Dropout(rate=cfg.attention_dropout_rate)(
                    probs, deterministic=deterministic
                )
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        else:
            raise ValueError(
                f"Unknown attention_impl {cfg.attention_impl!r}; expected "
                "'fused' | 'flash' | 'xla' | 'xla_remat'"
            )

        out = out.reshape(b, n, d)
        out = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name="out")(out)
        return out


class Mlp(nn.Module):
    cfg: ViTConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        x = nn.Dense(cfg.mlp_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        # HF ViT uses exact (erf) GELU. 'fast' keeps erf numerics to ~1e-6
        # (plus the backend tanh's own error) at tanh-approximation speed;
        # 'poly' is the FMA-only erf-exact form (max err 8.3e-7, same speed
        # as erf on v5e); 'tanh' is the conventional approximation
        # (a different function, max err 4.7e-4). See ops/gelu.py.
        if cfg.gelu == "fast":
            x = gelu_fast(x)
        elif cfg.gelu == "poly":
            x = gelu_poly(x)
        elif cfg.gelu in ("exact", "tanh"):
            x = nn.gelu(x, approximate=(cfg.gelu == "tanh"))
        else:
            raise ValueError(
                f"Unknown gelu variant {cfg.gelu!r}; expected "
                "'fast' | 'poly' | 'exact' | 'tanh'"
            )
        if cfg.dropout_rate > 0.0 and not deterministic:
            x = nn.Dropout(rate=cfg.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x)
        return x


class EncoderLayer(nn.Module):
    """Pre-LN transformer block (HF ViT layout: layernorm_before/after)."""

    cfg: ViTConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        x = x + Attention(cfg, dtype=self.dtype, name="attn")(
            ln("ln1")(x), deterministic=deterministic
        )
        x = x + Mlp(cfg, dtype=self.dtype, name="mlp")(
            ln("ln2")(x), deterministic=deterministic
        )
        return x


class ViT(nn.Module):
    """ViT classifier. ``__call__`` returns logits (B, num_classes).

    Reference surface: ``TIC/ViT/model.py:8`` — ``ViT(num_classes, pretrained,
    model_name)`` returning a model whose forward yields ``.logits``; here the
    module returns logits directly (JAX functional style). Pretrained-weight
    loading is a separate concern (``utils/pretrained.py``), since scratch vs
    pretrained differ only in the initial params pytree.

    The forward is split into ``embed`` (image -> positioned token sequence)
    and ``encode`` (tokens -> logits) so callers can interpose on the token
    stream — the sparse-MoE feature-level dispatch (``models/resmoe.py``)
    gathers routed samples between the two stages.
    """

    cfg: ViTConfig
    compute_dtype: str = "bfloat16"

    def setup(self):
        cfg = self.cfg
        dtype = _dtype(self.compute_dtype)
        self.patch_embed = PatchEmbed(cfg, dtype=dtype)
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size), jnp.float32
        )
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, cfg.seq_len, cfg.hidden_size),
            jnp.float32,
        )
        if cfg.dropout_rate > 0.0:
            self.embed_dropout = nn.Dropout(rate=cfg.dropout_rate)

        if cfg.remat:
            use_dots = cfg.remat_policy == "dots"
            if use_dots and jax.default_backend() == "axon":
                # the axon remote compile helper 500s on dots_saveable at
                # every batch size (documented toolchain bug); 'full' remat
                # is the working configuration on that backend
                import warnings

                warnings.warn(
                    "remat_policy='dots' crashes the axon remote compiler; "
                    "falling back to remat_policy='full'", stacklevel=2,
                )
                use_dots = False
            policy = jax.checkpoint_policies.dots_saveable if use_dots else None
            layer_cls = nn.remat(EncoderLayer, static_argnums=(2,), policy=policy)
        else:
            layer_cls = EncoderLayer
        self.layer = [layer_cls(cfg, dtype=dtype) for _ in range(cfg.num_layers)]
        self.final_ln = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dtype, param_dtype=jnp.float32
        )
        self.head = nn.Dense(
            cfg.num_classes, dtype=jnp.float32, param_dtype=jnp.float32
        )

    def embed(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        """Image (B, S, S, 3) -> positioned tokens (B, N+1, hidden)."""
        cfg = self.cfg
        dtype = _dtype(self.compute_dtype)
        if x.shape[1] != cfg.image_size or x.shape[2] != cfg.image_size:
            # image-size validation, as in TIC/ViT/model.py:34-38
            raise ValueError(
                f"Input spatial size {x.shape[1:3]} != configured "
                f"{(cfg.image_size, cfg.image_size)}"
            )
        x = self.patch_embed(x.astype(dtype))
        b = x.shape[0]
        cls = jnp.broadcast_to(
            self.cls_token.astype(dtype), (b, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([cls, x], axis=1) + self.pos_embed.astype(dtype)
        if cfg.dropout_rate > 0.0 and not deterministic:
            x = self.embed_dropout(x, deterministic=deterministic)
        return x

    def encode(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        """Positioned tokens (B, N+1, hidden) -> logits (B, num_classes)."""
        for layer in self.layer:
            x = layer(x, deterministic)
        x = self.final_ln(x)
        cls_out = x[:, 0]
        return self.head(cls_out.astype(jnp.float32))

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        return self.encode(self.embed(x, deterministic), deterministic)
