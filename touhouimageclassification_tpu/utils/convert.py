"""Checkpoint conversion: torch (HF ViT / torchvision-style ResNet) -> Flax.

The runtime has no network access, so the reference's download-on-demand
``ensure()`` (``TIC/utils/ensure.py:11-15``) is replaced by a converter that
turns locally available torch artifacts — reference ``.pth`` checkpoints
(bare HF state dicts, tuple checkpoints, Lightning exports) or HF snapshot
directories — into this framework's parameter pytrees, bit-exactly:

- HF ``ViTForImageClassification`` (``vit.embeddings...``/``classifier.*``
  keys) -> the fused-QKV flax tree of ``models/vit.py``,
- the reference's torchvision-style ResNet (``TIC/ResNet/model.py``) ->
  ``models/resnet.py`` params + batch_stats,
- the reference's ResMoE (``TIC/ResMoE/model.py``: per-expert HF ViTs +
  gate ViT) and TreeViT (``TIC/TreeViT/model.py``: root + son HF ViTs) ->
  the stacked-member flax trees of ``models/{resmoe,treevit}.py``.

Head-mismatch semantics follow ``ignore_mismatched_sizes=True``
(``TIC/ViT/model.py:27-32``): a classifier whose shape disagrees with
``num_classes`` is re-initialized (normal(0.02), HF's initializer_range).
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _strip_prefixes(sd: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Normalize key prefixes across the reference's checkpoint styles
    (bare HF, Lightning's ``vit.``-prefixed module, ``model.`` wrappers)."""
    out = {k: v for k, v in sd.items()}
    for prefix in ("model.", "module."):
        if all(k.startswith(prefix) for k in out):
            out = {k[len(prefix):]: v for k, v in out.items()}
    # Lightning ViTLModule: self.vit = HF model -> keys 'vit.vit.*' and
    # 'vit.classifier.*'; bare HF keys are 'vit.*' and 'classifier.*'.
    if any(k.startswith("vit.vit.") for k in out):
        out = {k[len("vit."):]: v for k, v in out.items() if k.startswith("vit.")}
    # Bare ViTModel snapshots (google/vit-*-in21k): keys 'embeddings.*',
    # 'encoder.*', 'layernorm.*' with no 'vit.' prefix and no classifier —
    # normalize to the ViTForImageClassification layout. 'pooler.*' weights
    # have no counterpart in the classifier model and are dropped.
    if any(k.startswith("embeddings.") for k in out) and not any(
        k.startswith("vit.") for k in out
    ):
        out = {
            ("vit." + k): v for k, v in out.items() if not k.startswith("pooler.")
        }
    return out


# ---------------------------------------------------------------------------
# ViT
# ---------------------------------------------------------------------------

def torch_vit_to_flax(
    state_dict: Mapping[str, Any],
    num_classes: int,
    head_init_seed: int = 0,
) -> dict:
    """HF ``ViTForImageClassification`` torch state dict -> flax params for
    :class:`models.vit.ViT`. Infers depth/width from the keys."""
    sd = {k: _np(v) for k, v in _strip_prefixes(state_dict).items()}

    hidden = sd["vit.embeddings.cls_token"].shape[-1]
    layers = sorted(
        {int(m.group(1)) for k in sd
         if (m := re.match(r"vit\.encoder\.layer\.(\d+)\.", k))}
    )

    params: dict[str, Any] = {
        "cls_token": sd["vit.embeddings.cls_token"],
        "pos_embed": sd["vit.embeddings.position_embeddings"],
        "patch_embed": {"proj": {
            # conv OIHW (H,3,P,P) -> flat (ph, pw, c) x out
            "kernel": sd["vit.embeddings.patch_embeddings.projection.weight"]
            .transpose(2, 3, 1, 0).reshape(-1, hidden),
            "bias": sd["vit.embeddings.patch_embeddings.projection.bias"],
        }},
        "final_ln": {
            "scale": sd["vit.layernorm.weight"],
            "bias": sd["vit.layernorm.bias"],
        },
    }
    for i in layers:
        p = f"vit.encoder.layer.{i}."
        qkv_kernel = np.concatenate(
            [sd[p + f"attention.attention.{n}.weight"].T for n in ("query", "key", "value")],
            axis=1,
        )
        qkv_bias = np.concatenate(
            [sd[p + f"attention.attention.{n}.bias"] for n in ("query", "key", "value")]
        )
        params[f"layer_{i}"] = {
            "ln1": {"scale": sd[p + "layernorm_before.weight"],
                    "bias": sd[p + "layernorm_before.bias"]},
            "ln2": {"scale": sd[p + "layernorm_after.weight"],
                    "bias": sd[p + "layernorm_after.bias"]},
            "attn": {
                "qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
                "out": {"kernel": sd[p + "attention.output.dense.weight"].T,
                        "bias": sd[p + "attention.output.dense.bias"]},
            },
            "mlp": {
                "fc1": {"kernel": sd[p + "intermediate.dense.weight"].T,
                        "bias": sd[p + "intermediate.dense.bias"]},
                "fc2": {"kernel": sd[p + "output.dense.weight"].T,
                        "bias": sd[p + "output.dense.bias"]},
            },
        }

    head_w = sd.get("classifier.weight")
    if head_w is not None and head_w.shape[0] == num_classes:
        params["head"] = {"kernel": head_w.T, "bias": sd["classifier.bias"]}
    else:
        # ignore_mismatched_sizes: fresh head, HF initializer_range=0.02
        rng = np.random.default_rng(head_init_seed)
        params["head"] = {
            "kernel": rng.normal(0.0, 0.02, (hidden, num_classes)).astype(np.float32),
            "bias": np.zeros((num_classes,), np.float32),
        }
    return params


# ---------------------------------------------------------------------------
# ResNet
# ---------------------------------------------------------------------------

def torch_resnet_to_flax(
    state_dict: Mapping[str, Any], num_classes: int
) -> tuple[dict, dict]:
    """Reference/torchvision ResNet state dict -> (params, batch_stats) for
    :class:`models.resnet.ResNet`."""
    sd = {k: _np(v) for k, v in _strip_prefixes(state_dict).items()}
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = leaf

    def conv(src):
        return {"kernel": sd[src + ".weight"].transpose(2, 3, 1, 0)}

    def bn(src, dst):
        put(params, dst + ("scale",), sd[src + ".weight"])
        put(params, dst + ("bias",), sd[src + ".bias"])
        put(stats, dst + ("mean",), sd[src + ".running_mean"])
        put(stats, dst + ("var",), sd[src + ".running_var"])

    put(params, ("stem_conv", "kernel"), conv("conv1")["kernel"])
    bn("bn1", ("stem_bn",))

    stage_blocks: dict[int, int] = {}
    for k in sd:
        m = re.match(r"layer(\d)\.(\d+)\.", k)
        if m:
            s, b = int(m.group(1)), int(m.group(2))
            stage_blocks[s] = max(stage_blocks.get(s, 0), b + 1)

    for s, nblocks in sorted(stage_blocks.items()):
        for b in range(nblocks):
            src = f"layer{s}.{b}"
            dst = f"stage{s}_block{b}"
            n_convs = 3 if f"{src}.conv3.weight" in sd else 2
            for j in range(1, n_convs + 1):
                put(params, (dst, f"conv{j}", "kernel"), conv(f"{src}.conv{j}")["kernel"])
                bn(f"{src}.bn{j}", (dst, f"bn{j}"))
            if f"{src}.downsample.0.weight" in sd:
                put(params, (dst, "downsample_conv", "kernel"),
                    conv(f"{src}.downsample.0")["kernel"])
                bn(f"{src}.downsample.1", (dst, "downsample_bn"))

    fc_w = sd.get("fc.weight")
    if fc_w is not None and fc_w.shape[0] == num_classes:
        params["head"] = {"kernel": fc_w.T, "bias": sd["fc.bias"]}
    else:
        rng = np.random.default_rng(0)
        # feature width = channels of the last stage's final BN
        last_stage = max(stage_blocks)
        last_block = stage_blocks[last_stage] - 1
        n_convs = 3 if f"layer{last_stage}.{last_block}.conv3.weight" in sd else 2
        width = sd[f"layer{last_stage}.{last_block}.bn{n_convs}.weight"].shape[0]
        params["head"] = {
            "kernel": rng.normal(0.0, 0.02, (width, num_classes)).astype(np.float32),
            "bias": np.zeros((num_classes,), np.float32),
        }
    return params, {"batch_stats": stats}


# ---------------------------------------------------------------------------
# ResMoE / TreeViT (compositions of HF ViTs)
# ---------------------------------------------------------------------------

def _subdict(sd: Mapping[str, Any], prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _stack_trees(trees: list) -> dict:
    """Stack per-member ViT param trees leaf-wise onto a leading axis — the
    layout of the ``nn.vmap``-stacked experts/sons in ``models/resmoe.py``
    and ``models/treevit.py``."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


def _member_ids(sd: Mapping[str, Any], name: str) -> list[int]:
    ids = sorted(
        {int(m.group(1)) for k in sd
         if (m := re.match(rf"{name}\.(\d+)\.", k))}
    )
    if not ids or ids != list(range(len(ids))):
        raise ValueError(
            f"checkpoint has no contiguous '{name}.N.*' keys "
            f"(found indices {ids}) — not a reference "
            f"{'MoEClassifier' if name == 'experts' else 'TreeModule'} "
            "state dict?"
        )
    return ids


def member_overrides(state_dict: Mapping[str, Any], model_type: str) -> dict:
    """Config overrides inferred from a reference MoE/TreeViT state dict —
    the expert/son count lives in the checkpoint, not the config, so loaders
    rebuild the model to match. ``{}`` for other model types."""
    mt = model_type.lower().replace("_", "-")
    if mt in ("vit-moe", "resmoe"):
        return {"num_experts": len(_member_ids(_strip_prefixes(state_dict),
                                               "experts"))}
    if mt in ("tree-vit", "treevit"):
        return {"num_categories": len(_member_ids(_strip_prefixes(state_dict),
                                                  "sons"))}
    return {}


def torch_moe_to_flax(state_dict: Mapping[str, Any], num_classes: int) -> dict:
    """Reference ``MoEClassifier`` state dict (``TIC/ResMoE/model.py:40-72``:
    ``experts.{i}.*`` HF ViTs, ``gate.vit.*`` = the GatingNetwork's HF ViT
    whose head scores the experts, identity backbone) -> flax params for
    :class:`models.resmoe.MoEClassifier` (gate ViT under ``gate/vit``,
    experts stacked on a leading axis)."""
    sd = _strip_prefixes(dict(state_dict))
    expert_ids = _member_ids(sd, "experts")
    gate = torch_vit_to_flax(_subdict(sd, "gate.vit."),
                             num_classes=len(expert_ids))
    experts = [
        torch_vit_to_flax(_subdict(sd, f"experts.{i}."), num_classes,
                          head_init_seed=i)
        for i in expert_ids
    ]
    return {"gate": {"vit": gate}, "experts": _stack_trees(experts)}


def torch_treevit_to_flax(state_dict: Mapping[str, Any],
                          num_classes: int) -> dict:
    """Reference ``TreeModule`` state dict (``TIC/TreeViT/model.py:7-30``:
    ``root.*`` HF ViT scoring categories, ``sons.{i}.*`` HF ViTs scoring
    classes) -> flax params for :class:`models.treevit.TreeViT` (root ViT +
    sons stacked on a leading axis)."""
    sd = _strip_prefixes(dict(state_dict))
    son_ids = _member_ids(sd, "sons")
    root = torch_vit_to_flax(_subdict(sd, "root."), num_classes=len(son_ids))
    sons = [
        torch_vit_to_flax(_subdict(sd, f"sons.{i}."), num_classes,
                          head_init_seed=i)
        for i in son_ids
    ]
    return {"root": root, "sons": _stack_trees(sons)}


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------

def _normalize_ckpt(path):
    """Reference ``.pth`` path (or an already-loaded object) -> bare state
    dict. Tolerates the tuple checkpoints ``(model_sd, optim[, sched])`` and
    dict formats the reference loaders accept
    (``TIC/utils/serve.py:71-77``)."""
    if isinstance(path, (str, bytes)) or hasattr(path, "__fspath__"):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    else:
        ckpt = path
    if isinstance(ckpt, tuple):
        ckpt = ckpt[0]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if isinstance(ckpt, dict) and "model" in ckpt and all(
        hasattr(v, "shape") for v in ckpt["model"].values()
    ):
        ckpt = ckpt["model"]
    return ckpt


def load_torch_checkpoint(path, model, num_classes: int):
    """Reference ``.pth`` path (or an already-loaded state dict) ->
    (params, model_state) for ``model``."""
    from ..models.resmoe import MoEClassifier
    from ..models.resnet import ResNet
    from ..models.treevit import TreeViT
    from ..models.vit import ViT

    ckpt = _normalize_ckpt(path)

    if isinstance(model, MoEClassifier):
        params = torch_moe_to_flax(ckpt, num_classes)
        got = params["experts"]["cls_token"].shape[0]
        if got != model.cfg.num_experts:
            raise ValueError(
                f"checkpoint holds {got} experts but the model is configured "
                f"for {model.cfg.num_experts} (MoEConfig.num_experts)"
            )
        return params, {}
    if isinstance(model, TreeViT):
        params = torch_treevit_to_flax(ckpt, num_classes)
        got = params["sons"]["cls_token"].shape[0]
        if got != model.cfg.num_categories:
            raise ValueError(
                f"checkpoint holds {got} sons but the model is configured "
                f"for {model.cfg.num_categories} (TreeViTConfig.num_categories)"
            )
        return params, {}
    if isinstance(model, ViT):
        return torch_vit_to_flax(ckpt, num_classes), {}
    if isinstance(model, ResNet):
        return torch_resnet_to_flax(ckpt, num_classes)
    raise NotImplementedError(f"No torch converter for {type(model).__name__}")


def convert_and_save(path: str, model_type: str, num_classes: int, out_dir: str):
    """CLI helper: ``.pth`` -> Orbax params dir consumable by serve. For
    MoE/TreeViT checkpoints the expert/son count is inferred from the state
    dict, so the default configs need no hand-editing."""
    from ..models import create_model
    from ..train.checkpoint import save_params

    ckpt = _normalize_ckpt(path)
    overrides = member_overrides(ckpt, model_type)
    model = create_model(model_type, num_classes=num_classes, **overrides)
    params, model_state = load_torch_checkpoint(ckpt, model, num_classes)
    payload = {"params": params}
    if model_state:
        payload["model_state"] = model_state
    save_params(out_dir, payload)
    return out_dir


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description="Convert torch checkpoints to Orbax")
    parser.add_argument("--input", required=True, help=".pth checkpoint path")
    parser.add_argument("--model", required=True, help="model type (vit-large, resnet152, ...)")
    parser.add_argument("--num-classes", type=int, default=120)
    parser.add_argument("--output", required=True, help="output Orbax dir")
    args = parser.parse_args()
    convert_and_save(args.input, args.model, args.num_classes, args.output)
    print(f"Saved converted params to {args.output}")
