"""Golden-logit parity: torch HF ViT -> converter -> flax ViT.

This is the load-bearing test for serving reference checkpoints: a randomly
initialized torch ``ViTForImageClassification`` (no network needed) must
produce the same logits as our flax ViT after conversion.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402

from touhouimageclassification_tpu.config import ViTConfig  # noqa: E402
from touhouimageclassification_tpu.models.vit import ViT  # noqa: E402
from touhouimageclassification_tpu.utils.convert import (  # noqa: E402
    torch_resnet_to_flax,
    torch_vit_to_flax,
)

HIDDEN, LAYERS, HEADS, MLP, IMG, PATCH, NCLS = 64, 2, 4, 128, 32, 16, 7


def _torch_vit():
    cfg = transformers.ViTConfig(
        hidden_size=HIDDEN, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=MLP, image_size=IMG, patch_size=PATCH, num_labels=NCLS,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = transformers.ViTForImageClassification(cfg)
    model.eval()
    return model


def test_vit_logit_parity():
    tmodel = _torch_vit()
    params = torch_vit_to_flax(tmodel.state_dict(), num_classes=NCLS)

    fcfg = ViTConfig(image_size=IMG, patch_size=PATCH, hidden_size=HIDDEN,
                     num_layers=LAYERS, num_heads=HEADS, mlp_dim=MLP, num_classes=NCLS)
    fmodel = ViT(fcfg, compute_dtype="float32")

    x = np.random.default_rng(1).normal(size=(3, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits.numpy()
    f_logits = np.asarray(fmodel.apply({"params": params}, x))
    np.testing.assert_allclose(f_logits, t_logits, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("variant", ["poly", "fast"])
def test_vit_logit_parity_fitted_gelu(variant):
    """The fitted GELUs serve converted torch checkpoints at the SAME
    golden-logit tolerance as the erf path (ops/gelu.py accuracy bounds are
    orders below this test's atol)."""
    import dataclasses

    tmodel = _torch_vit()
    params = torch_vit_to_flax(tmodel.state_dict(), num_classes=NCLS)
    fcfg = ViTConfig(image_size=IMG, patch_size=PATCH, hidden_size=HIDDEN,
                     num_layers=LAYERS, num_heads=HEADS, mlp_dim=MLP,
                     num_classes=NCLS)
    fmodel = ViT(dataclasses.replace(fcfg, gelu=variant), compute_dtype="float32")

    x = np.random.default_rng(1).normal(size=(3, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits.numpy()
    f_logits = np.asarray(fmodel.apply({"params": params}, x))
    np.testing.assert_allclose(f_logits, t_logits, atol=2e-4, rtol=1e-3)


def test_vit_head_reinit_on_mismatch():
    tmodel = _torch_vit()
    params = torch_vit_to_flax(tmodel.state_dict(), num_classes=11)
    assert params["head"]["kernel"].shape == (HIDDEN, 11)
    # backbone weights still converted
    assert params["layer_0"]["attn"]["qkv"]["kernel"].shape == (HIDDEN, 3 * HIDDEN)


def test_vit_lightning_prefix_stripping():
    tmodel = _torch_vit()
    sd = {f"vit.{k}": v for k, v in tmodel.state_dict().items()}  # ViTLModule style
    params = torch_vit_to_flax(sd, num_classes=NCLS)
    fcfg = ViTConfig(image_size=IMG, patch_size=PATCH, hidden_size=HIDDEN,
                     num_layers=LAYERS, num_heads=HEADS, mlp_dim=MLP, num_classes=NCLS)
    fmodel = ViT(fcfg, compute_dtype="float32")
    x = np.zeros((1, IMG, IMG, 3), np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits.numpy()
    f_logits = np.asarray(fmodel.apply({"params": params}, x))
    np.testing.assert_allclose(f_logits, t_logits, atol=2e-4, rtol=1e-3)


def _fake_torch_resnet18_sd(ncls=5):
    """State dict with torchvision resnet18 names/shapes (random values)."""
    g = torch.Generator().manual_seed(0)
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = torch.randn(o, i, k, k, generator=g) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = torch.rand(c, generator=g) + 0.5
        sd[name + ".bias"] = torch.randn(c, generator=g) * 0.1
        sd[name + ".running_mean"] = torch.randn(c, generator=g) * 0.1
        sd[name + ".running_var"] = torch.rand(c, generator=g) + 0.5

    conv("conv1", 64, 3, 7); bn("bn1", 64)
    widths = [64, 128, 256, 512]
    for s, w in enumerate(widths, start=1):
        for b in range(2):
            pre = f"layer{s}.{b}"
            w_in = w if (b > 0 or s == 1) else widths[s - 2]
            conv(f"{pre}.conv1", w, w_in, 3); bn(f"{pre}.bn1", w)
            conv(f"{pre}.conv2", w, w, 3); bn(f"{pre}.bn2", w)
            if s > 1 and b == 0:
                conv(f"{pre}.downsample.0", w, w_in, 1); bn(f"{pre}.downsample.1", w)
    sd["fc.weight"] = torch.randn(ncls, 512, generator=g) * 0.05
    sd["fc.bias"] = torch.zeros(ncls)
    return sd


def test_resnet_conversion_structure_and_forward():
    from touhouimageclassification_tpu.models.resnet import resnet

    sd = _fake_torch_resnet18_sd(ncls=5)
    params, model_state = torch_resnet_to_flax(sd, num_classes=5)
    model = resnet(18, num_classes=5, image_size=32)

    # converted tree must be loadable in place of an init tree
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    ref_vars = model.init(jax.random.key(0), x)
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref_vars["params"])
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes

    logits = model.apply({"params": params, **model_state}, x)
    assert logits.shape == (2, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_resnet_head_reinit_on_mismatch():
    """Head width must match the last stage's output when re-initialized
    (BasicBlock: 512; Bottleneck: 2048)."""
    sd = _fake_torch_resnet18_sd(ncls=7)   # checkpoint trained with 7 classes
    params, _ = torch_resnet_to_flax(sd, num_classes=3)
    assert params["head"]["kernel"].shape == (512, 3)


def test_vitmodel_in21k_layout_converts():
    """Bare ViTModel snapshots (google/vit-*-in21k) have no 'vit.' prefix and
    no classifier; the converter must normalize and reinit the head."""
    cfg = transformers.ViTConfig(
        hidden_size=HIDDEN, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=MLP, image_size=IMG, patch_size=PATCH,
    )
    torch.manual_seed(0)
    backbone = transformers.ViTModel(cfg)   # in21k snapshot layout
    params = torch_vit_to_flax(backbone.state_dict(), num_classes=NCLS)
    assert params["head"]["kernel"].shape == (HIDDEN, NCLS)

    # backbone outputs must match a classifier model carrying those weights
    full = transformers.ViTForImageClassification(
        transformers.ViTConfig(hidden_size=HIDDEN, num_hidden_layers=LAYERS,
                               num_attention_heads=HEADS, intermediate_size=MLP,
                               image_size=IMG, patch_size=PATCH, num_labels=NCLS))
    full.vit.load_state_dict(backbone.state_dict(), strict=False)
    from touhouimageclassification_tpu.config import ViTConfig as FViTConfig
    from touhouimageclassification_tpu.models.vit import ViT as FViT

    fmodel = FViT(FViTConfig(image_size=IMG, patch_size=PATCH, hidden_size=HIDDEN,
                             num_layers=LAYERS, num_heads=HEADS, mlp_dim=MLP,
                             num_classes=NCLS), compute_dtype="float32")
    x = np.random.default_rng(3).normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        t_hidden = full.vit(torch.from_numpy(x.transpose(0, 3, 1, 2))
                            ).last_hidden_state.numpy()
    # compare pre-head CLS features via the converted flax model by zeroing
    # the head bias/kernel symmetry: easier — compare logits after loading
    # the SAME reinit head into torch
    with torch.no_grad():
        full.classifier.weight.copy_(torch.from_numpy(params["head"]["kernel"].T))
        full.classifier.bias.copy_(torch.from_numpy(params["head"]["bias"]))
        t_logits = full(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits.numpy()
    f_logits = np.asarray(fmodel.apply({"params": params}, x))
    np.testing.assert_allclose(f_logits, t_logits, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# ResMoE / TreeViT conversion
# ---------------------------------------------------------------------------

def _tiny_hf_cfg(num_labels):
    return transformers.ViTConfig(
        hidden_size=HIDDEN, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=MLP, image_size=IMG, patch_size=PATCH,
        num_labels=num_labels,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )


class _TorchGate(torch.nn.Module):
    """Test-local mirror of the reference GatingNetwork in eval mode
    (TIC/ResMoE/model.py:24-38): HF ViT scoring experts, top-k + softmax."""

    def __init__(self, num_experts, top_k):
        super().__init__()
        self.vit = transformers.ViTForImageClassification(
            _tiny_hf_cfg(num_experts))
        self.top_k = top_k

    def forward(self, x):
        logits = self.vit(x).logits
        w, i = torch.topk(logits, self.top_k, dim=1)
        return torch.softmax(w, dim=1), i


class _TorchMoE(torch.nn.Module):
    """Test-local mirror of the reference MoEClassifier forward
    (TIC/ResMoE/model.py:40-58): dense expert stack + scattered gate bmm."""

    def __init__(self, num_experts, top_k, num_classes):
        super().__init__()
        self.experts = torch.nn.ModuleList([
            transformers.ViTForImageClassification(_tiny_hf_cfg(num_classes))
            for _ in range(num_experts)
        ])
        self.gate = _TorchGate(num_experts, top_k)

    def forward(self, x):
        w, idx = self.gate(x)
        gate = torch.zeros(x.shape[0], len(self.experts))
        gate = torch.scatter(gate, 1, idx, w)
        outs = torch.stack([e(x).logits for e in self.experts], dim=1)
        return torch.bmm(gate.unsqueeze(1), outs).squeeze(1), gate, idx


def _tiny_flax_vit_cfg():
    return ViTConfig(image_size=IMG, patch_size=PATCH, hidden_size=HIDDEN,
                     num_layers=LAYERS, num_heads=HEADS, mlp_dim=MLP,
                     num_classes=NCLS)


def test_moe_logit_parity():
    """Reference MoEClassifier .pth -> converter -> flax dense-mode MoE."""
    from touhouimageclassification_tpu.config import MoEConfig
    from touhouimageclassification_tpu.models.resmoe import MoEClassifier
    from touhouimageclassification_tpu.utils.convert import torch_moe_to_flax

    torch.manual_seed(1)
    tmoe = _TorchMoE(num_experts=3, top_k=2, num_classes=NCLS)
    tmoe.eval()
    params = torch_moe_to_flax(tmoe.state_dict(), num_classes=NCLS)
    assert params["experts"]["cls_token"].shape[0] == 3

    fmoe = MoEClassifier(
        MoEConfig(num_experts=3, top_k=2, num_classes=NCLS,
                  expert_vit=_tiny_flax_vit_cfg(), routing="dense"),
        compute_dtype="float32")
    x = np.random.default_rng(2).normal(size=(4, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        t_comb, t_gate, _ = tmoe(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    f_comb, f_gate, _ = fmoe.apply({"params": params}, x, True)
    np.testing.assert_allclose(np.asarray(f_gate), t_gate.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f_comb), t_comb.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_moe_lightning_prefix_and_dict_format():
    """ResMoETrainerModule checkpoints ({'model': sd, 'optimizer': ...,
    'epoch': ..., 'loss': ...}, TIC/ResMoE/train.py:82-89, with the module's
    'model.' key prefix) must load through load_torch_checkpoint."""
    from touhouimageclassification_tpu.config import MoEConfig
    from touhouimageclassification_tpu.models.resmoe import MoEClassifier
    from touhouimageclassification_tpu.utils.convert import load_torch_checkpoint

    torch.manual_seed(1)
    tmoe = _TorchMoE(num_experts=3, top_k=2, num_classes=NCLS)
    ckpt = {"model": tmoe.state_dict(), "optimizer": {}, "epoch": 5, "loss": 0.1}
    fmoe = MoEClassifier(
        MoEConfig(num_experts=3, top_k=2, num_classes=NCLS,
                  expert_vit=_tiny_flax_vit_cfg()), compute_dtype="float32")
    params, state = load_torch_checkpoint(ckpt, fmoe, NCLS)
    assert state == {}
    assert params["gate"]["vit"]["head"]["kernel"].shape == (HIDDEN, 3)


def test_moe_expert_count_mismatch_is_loud():
    from touhouimageclassification_tpu.config import MoEConfig
    from touhouimageclassification_tpu.models.resmoe import MoEClassifier
    from touhouimageclassification_tpu.utils.convert import load_torch_checkpoint

    torch.manual_seed(1)
    tmoe = _TorchMoE(num_experts=3, top_k=2, num_classes=NCLS)
    fmoe = MoEClassifier(
        MoEConfig(num_experts=8, top_k=2, num_classes=NCLS,
                  expert_vit=_tiny_flax_vit_cfg()))
    with pytest.raises(ValueError, match="3 experts"):
        load_torch_checkpoint(tmoe.state_dict(), fmoe, NCLS)


class _TorchTree(torch.nn.Module):
    """Test-local mirror of the reference TreeModule forward
    (TIC/TreeViT/model.py:7-24): root picks top-k categories, a per-sample
    loop pushes each image through its chosen sons, softmaxed weights
    combine. (The reference forgets .logits on the root call — one of the
    documented WIP bugs; the intended math uses logits.)"""

    def __init__(self, num_categories, num_classes, top_k):
        super().__init__()
        self.root = transformers.ViTForImageClassification(
            _tiny_hf_cfg(num_categories))
        self.sons = torch.nn.ModuleList([
            transformers.ViTForImageClassification(_tiny_hf_cfg(num_classes))
            for _ in range(num_categories)
        ])
        self.top_k = top_k

    def forward(self, x):
        choose = self.root(x).logits
        w, idx = torch.topk(choose, self.top_k, dim=1)
        smoothed = torch.softmax(w, dim=1)
        son_logits = torch.cat([
            torch.stack([self.sons[i.item()](x[b:b + 1]).logits
                         for i in idx[b]], dim=1)
            for b in range(x.shape[0])
        ], dim=0)
        return torch.bmm(smoothed.unsqueeze(1), son_logits).squeeze(1)


def test_treevit_logit_parity():
    """Reference TreeModule .pth -> converter -> flax TreeViT."""
    from touhouimageclassification_tpu.config import TreeViTConfig
    from touhouimageclassification_tpu.models.treevit import TreeViT
    from touhouimageclassification_tpu.utils.convert import torch_treevit_to_flax

    torch.manual_seed(3)
    ttree = _TorchTree(num_categories=3, num_classes=NCLS, top_k=2)
    ttree.eval()
    params = torch_treevit_to_flax(ttree.state_dict(), num_classes=NCLS)
    assert params["sons"]["cls_token"].shape[0] == 3

    # capacity_factor sized so no routed sample is ever dropped (the torch
    # loop has no capacity; parity needs every (sample, son) pair computed)
    ftree = TreeViT(
        TreeViTConfig(num_categories=3, num_classes=NCLS, top_k=2,
                      capacity_factor=3.0, vit=_tiny_flax_vit_cfg()),
        compute_dtype="float32")
    x = np.random.default_rng(4).normal(size=(3, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        t_comb = ttree(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        t_choice = ttree.root(torch.from_numpy(x.transpose(0, 3, 1, 2))
                              ).logits.numpy()
    f_comb, f_choice, _ = ftree.apply({"params": params}, x, True)
    np.testing.assert_allclose(np.asarray(f_choice), t_choice,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(f_comb), t_comb,
                               atol=2e-4, rtol=1e-3)


def test_convert_and_save_infers_member_counts(tmp_path):
    """The CLI path builds the model with the checkpoint's expert count, not
    the config default (8)."""
    from touhouimageclassification_tpu.utils import convert as C

    torch.manual_seed(1)
    tmoe = _TorchMoE(num_experts=3, top_k=2, num_classes=NCLS)
    pth = tmp_path / "moe.pth"
    torch.save(tmoe.state_dict(), pth)

    built = {}
    real_create = None

    def spy_create(model_type, num_classes, **overrides):
        built.update(overrides)
        raise RuntimeError("stop before Orbax")  # count check is the point

    import touhouimageclassification_tpu.models as M
    real_create = M.create_model
    try:
        M.create_model = spy_create
        with pytest.raises(RuntimeError, match="stop before Orbax"):
            C.convert_and_save(str(pth), "resmoe", NCLS, str(tmp_path / "out"))
    finally:
        M.create_model = real_create
    assert built == {"num_experts": 3}
