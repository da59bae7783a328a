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
