"""utils/extract_ckpt.py — training ckpt -> bare serving params
(parity: TIC/utils/extract_ckpt.py:12-29 unwraps wrapped torch ckpts)."""
import numpy as np
import pytest

from touhouimageclassification_tpu.train.checkpoint import (load_params,
                                                            save_params)
from touhouimageclassification_tpu.utils.extract_ckpt import extract


def test_extract_unwraps_training_payload(tmp_path):
    # a "training checkpoint" with extra state beyond params + model_state
    full = {
        "params": {"dense": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)}},
        "model_state": {"batch_stats": {"mean": np.zeros(3, np.float32)}},
        "opt_state": {"momentum": np.ones(6, np.float32)},
        "step": np.asarray(123),
    }
    src = tmp_path / "train_ckpt"
    dst = tmp_path / "serving"
    save_params(str(src), full)

    out = extract(str(src), str(dst))
    assert out == str(dst)
    restored = load_params(str(dst))
    assert set(restored) == {"params", "model_state"}  # opt_state stripped
    np.testing.assert_array_equal(restored["params"]["dense"]["kernel"],
                                  full["params"]["dense"]["kernel"])
    np.testing.assert_array_equal(
        restored["model_state"]["batch_stats"]["mean"], np.zeros(3))


def test_extract_passes_through_bare_params(tmp_path):
    bare = {"dense": {"kernel": np.ones((2, 2), np.float32)}}
    src, dst = tmp_path / "bare", tmp_path / "out"
    save_params(str(src), bare)
    extract(str(src), str(dst))
    restored = load_params(str(dst))
    np.testing.assert_array_equal(restored["dense"]["kernel"],
                                  bare["dense"]["kernel"])


def test_extract_pth_requires_model_type(tmp_path):
    pth = tmp_path / "weights.pth"
    pth.write_bytes(b"not really torch")
    with pytest.raises(SystemExit):
        extract(str(pth), str(tmp_path / "out"))
