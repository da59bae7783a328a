"""CLI ``__main__`` blocks of the small utils (check_sha, sample_dataset,
extract_ckpt) driven via runpy — the reference ships each of these as a
run-directly script (``TIC/utils/check_sha.py``, ``sample_dataset.py``,
``extract_ckpt.py``), so the argv surface is part of parity."""
import os
import runpy
import sys

import numpy as np
import pytest
from PIL import Image

from fixtures import make_image_folder


def _run_main(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [module.rsplit(".", 1)[-1], *argv])
    return runpy.run_module(module, run_name="__main__")


def test_check_sha_main_reports_dups(tmp_path, monkeypatch, capsys):
    src = tmp_path / "train" / "c"
    dst = tmp_path / "test" / "c"
    src.mkdir(parents=True)
    dst.mkdir(parents=True)
    (src / "a.jpg").write_bytes(b"same-bytes")
    (dst / "dup.jpg").write_bytes(b"same-bytes")
    (dst / "uniq.jpg").write_bytes(b"other-bytes")
    _run_main("touhouimageclassification_tpu.utils.check_sha",
              ["--src", str(tmp_path / "train"), "--dst", str(tmp_path / "test")],
              monkeypatch)
    out = capsys.readouterr().out
    assert "Duplicated: 1" in out
    assert "Unique: 1" in out


def test_sample_dataset_main_all_modes(tmp_path, monkeypatch, capsys):
    src = make_image_folder(str(tmp_path / "src"), num_classes=2,
                            per_class=10, size=16)
    dst = str(tmp_path / "dst")
    mod = "touhouimageclassification_tpu.utils.sample_dataset"
    _run_main(mod, ["--src", src, "--dst", dst, "-p", "0.5"], monkeypatch)
    assert "images copied" in capsys.readouterr().out
    # each file is kept with probability p (reference :12-20), so the count
    # is binomial — assert a sane range, not an exact half
    copied = sum(len(fs) for _, _, fs in os.walk(dst))
    assert 1 <= copied < 20

    _run_main(mod, ["--src", src, "--dst", dst, "--add-reference"],
              monkeypatch)
    assert "references added" in capsys.readouterr().out
    _run_main(mod, ["--src", src, "--dst", dst, "--del-reference"],
              monkeypatch)
    assert "references removed" in capsys.readouterr().out


def test_extract_ckpt_main_orbax_roundtrip(tmp_path, monkeypatch, capsys):
    from touhouimageclassification_tpu.train.checkpoint import (load_params,
                                                                save_params)

    params = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
              "opt_state": {"momentum": np.zeros((2, 3), np.float32)}}
    src = tmp_path / "train_ckpt"
    save_params(str(src), params)
    out = tmp_path / "serving"
    _run_main("touhouimageclassification_tpu.utils.extract_ckpt",
              ["--input", str(src), "--output", str(out)], monkeypatch)
    assert "Extracted to" in capsys.readouterr().out
    restored = load_params(str(out))
    # serving payload keeps params, drops optimizer state
    assert "opt_state" not in restored
    np.testing.assert_array_equal(restored["params"]["w"],
                                  params["params"]["w"])


def test_extract_ckpt_pth_requires_model(tmp_path, monkeypatch):
    pth = tmp_path / "weights.pth"
    pth.write_bytes(b"not really a pth")
    with pytest.raises(SystemExit, match="--model is required"):
        _run_main("touhouimageclassification_tpu.utils.extract_ckpt",
                  ["--input", str(pth), "--output", str(tmp_path / "o")],
                  monkeypatch)
