"""`utils/pretrained.py` — zero-egress pretrained-backbone resolution.

The reference's ``ensure()`` (``TIC/utils/ensure.py:11-15``) downloads HF
snapshots; this environment has no network, so resolution walks local
caches: a converted Orbax params dir, then HF snapshot layouts, then a
loud scratch-init fallback. Every branch is drivable with synthetic
fixtures — a tiny torch ViT state dict plays the snapshot."""
import os

import numpy as np
import pytest
import torch
import transformers

from touhouimageclassification_tpu.utils.pretrained import (
    _adapt_head, ensure, load_pretrained_backbone)

NCLS = 7


def _tiny_torch_vit_sd():
    cfg = transformers.ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=16, num_labels=NCLS,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    return transformers.ViTForImageClassification(cfg).state_dict()


def test_not_found_warns_and_returns_none(tmp_path):
    with pytest.warns(UserWarning, match="No pretrained weights"):
        out = load_pretrained_backbone("vit-base", 5, cache_dir=str(tmp_path))
    assert out is None


def test_hf_snapshot_bin_loads_and_adapts_head(tmp_path):
    snap = tmp_path / "google--vit-base-patch16-224-in21k"
    snap.mkdir()
    torch.save(_tiny_torch_vit_sd(), snap / "pytorch_model.bin")
    params = load_pretrained_backbone("vit-base", 11,
                                      cache_dir=str(tmp_path))
    assert params is not None
    assert np.asarray(params["head"]["kernel"]).shape[-1] == 11


def test_sharded_only_snapshot_raises(tmp_path):
    snap = tmp_path / "google--vit-base-patch16-224-in21k"
    snap.mkdir()
    sd = _tiny_torch_vit_sd()
    torch.save(sd, snap / "pytorch_model-00001-of-00002.bin")
    torch.save(sd, snap / "pytorch_model-00002-of-00002.bin")
    with pytest.raises(ValueError, match="sharded checkpoint"):
        load_pretrained_backbone("vit-base", 5, cache_dir=str(tmp_path))


def test_multiple_whole_files_warn_and_pick_deterministic(tmp_path):
    snap = tmp_path / "google--vit-base-patch16-224-in21k"
    snap.mkdir()
    sd = _tiny_torch_vit_sd()
    torch.save(sd, snap / "pytorch_model.bin")
    torch.save(sd, snap / "pytorch_model_v2.bin")
    with pytest.warns(UserWarning, match="weight files under"):
        params = load_pretrained_backbone("vit-base", NCLS,
                                          cache_dir=str(tmp_path))
    assert params is not None


def test_orbax_params_dir_shortcircuits(tmp_path):
    from touhouimageclassification_tpu.train.checkpoint import save_params

    hidden = 16
    params = {
        "head": {"kernel": np.zeros((hidden, 3), np.float32),
                 "bias": np.zeros((3,), np.float32)},
        "embed": {"kernel": np.ones((4, hidden), np.float32)},
    }
    orbax_dir = tmp_path / "google--vit-base-patch16-224-in21k"
    save_params(str(orbax_dir), params)
    # head matches the requested class count -> passed through untouched
    out = load_pretrained_backbone("vit-base", 3, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(out["embed"]["kernel"],
                                  params["embed"]["kernel"])
    # a different class count reinitializes the head at the config's width
    out2 = load_pretrained_backbone("vit-base", 9, cache_dir=str(tmp_path))
    assert np.asarray(out2["head"]["kernel"]).shape[-1] == 9


def test_adapt_head_passthrough_when_matching():
    params = {"head": {"kernel": np.ones((8, 4), np.float32),
                       "bias": np.zeros((4,), np.float32)}}
    out = _adapt_head(params, 8, 4)
    assert out is params  # untouched, same object


def test_ensure_found_and_missing(tmp_path):
    (tmp_path / "models--google--vit-base-patch16-224-in21k").mkdir()
    path = ensure("google/vit-base-patch16-224-in21k",
                  cache_dir=str(tmp_path))
    assert os.path.isdir(path)
    with pytest.raises(FileNotFoundError, match="not cached"):
        ensure("google/never-heard-of-it", cache_dir=str(tmp_path))
