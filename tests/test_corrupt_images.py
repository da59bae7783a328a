"""Corrupt/truncated-image resilience.

A crawled corpus (the reference pipeline's actual input, crawler/
pixiv_crawl.py) always contains a few undecodable files; the reference's
per-image PIL loop crashes the whole judging run on the first one
(serve.py:212-213). Policy here:

- serving (`full_judge`): zero-fill, SKIP the row in CSV/accuracy, report
  at the end — and never mark the slot done in the canvas cache;
- training (`HostImageLoader` / `decode_batch_into(on_error='raise')`):
  corrupt data stays LOUD, matching the reference loop.
"""
import os
import shutil

import jax
import numpy as np
import pytest

from touhouimageclassification_tpu.config import ViTConfig
from touhouimageclassification_tpu.data import loader as L
from touhouimageclassification_tpu.data.folder import scan_image_folder
from touhouimageclassification_tpu.infer.serve import Predictor, full_judge
from touhouimageclassification_tpu.models.vit import ViT

from fixtures import make_image_folder

N_CLASSES = 2
TINY = ViTConfig(image_size=32, patch_size=8, hidden_size=32, num_layers=1,
                 num_heads=2, mlp_dim=64, num_classes=N_CLASSES)


def _write_corrupt_files(cdir):
    """Three corruption flavors, all with image extensions."""
    with open(os.path.join(cdir, "truncated.jpg"), "wb") as f:
        # valid SOI/JFIF header, then cut off mid-stream
        f.write(bytes.fromhex("ffd8ffe000104a46494600010100000100010000ffdb"))
    with open(os.path.join(cdir, "garbage.jpg"), "wb") as f:
        f.write(b"this is not an image at all, just bytes" * 4)
    open(os.path.join(cdir, "empty.jpg"), "wb").close()


def _make_predictor(dataset):
    index = scan_image_folder(dataset, persist_class_map=False)
    model = ViT(TINY)
    params = model.init(jax.random.key(0),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    return Predictor(
        model=model, params=params, model_state={},
        class_to_idx=index.class_to_idx, image_size=(32, 32),
        mean=np.array([0.5, 0.5, 0.5]), std=np.array([0.25, 0.25, 0.25]),
    )


@pytest.fixture()
def mixed_dir(tmp_path):
    """4 good jpgs + 3 corrupt files in one class dir."""
    data = make_image_folder(str(tmp_path / "d"), num_classes=N_CLASSES,
                             per_class=4, size=32)
    _write_corrupt_files(os.path.join(data, "class_00"))
    return data


def _paths(data):
    good = [os.path.join(data, "class_00", f"{i}.jpg") for i in range(4)]
    bad = [os.path.join(data, "class_00", n)
           for n in ("truncated.jpg", "garbage.jpg", "empty.jpg")]
    return good, bad


def test_decode_batch_into_zero_mode_flags_bad_slots(mixed_dir):
    good, bad = _paths(mixed_dir)
    paths = [good[0], bad[0], good[1], bad[1], good[2], bad[2], good[3]]
    out = np.full((len(paths), 32, 32, 3), 7, np.uint8)
    failed = L.decode_batch_into(paths, (32, 32), out, on_error="zero")
    assert sorted(failed.tolist()) == [1, 3, 5]
    for j in (1, 3, 5):
        assert not out[j].any(), "failed slots must be zero-filled"
    for j in (0, 2, 4, 6):
        assert out[j].any(), "good slots must be decoded"
    # good slots decode identically to the strict path
    ref = np.empty((4, 32, 32, 3), np.uint8)
    assert L.decode_batch_into(good, (32, 32), ref).size == 0
    np.testing.assert_array_equal(out[[0, 2, 4, 6]], ref)


def test_decode_batch_into_raise_mode_stays_loud(mixed_dir):
    good, bad = _paths(mixed_dir)
    out = np.empty((2, 32, 32, 3), np.uint8)
    with pytest.raises(Exception):
        L.decode_batch_into([good[0], bad[0]], (32, 32), out)


def test_decode_pil_fallback_zero_mode(mixed_dir, tmp_path):
    """Non-JPEG extensions bypass the native decoder: the threaded PIL path
    must apply the same policy."""
    good, _ = _paths(mixed_dir)
    png = str(tmp_path / "fake.png")
    with open(png, "wb") as f:
        f.write(b"not a png")
    out = np.empty((2, 32, 32, 3), np.uint8)
    failed = L.decode_batch_into([good[0], png], (32, 32), out,
                                 on_error="zero")
    assert failed.tolist() == [1]
    assert not out[1].any() and out[0].any()
    with pytest.raises(Exception):
        L.decode_batch_into([good[0], png], (32, 32), out)


def test_renamed_png_decodes_via_pil_retry(mixed_dir):
    """A PNG renamed .jpg fails libjpeg but PIL accepts it — the native
    path's per-slot retry must rescue it, not skip it."""
    from PIL import Image

    good, _ = _paths(mixed_dir)
    sneaky = os.path.join(mixed_dir, "class_00", "sneaky.jpg")
    Image.fromarray(np.full((32, 32, 3), 99, np.uint8)).save(
        sneaky, format="PNG")
    out = np.empty((2, 32, 32, 3), np.uint8)
    failed = L.decode_batch_into([good[0], sneaky], (32, 32), out,
                                 on_error="zero")
    assert failed.size == 0
    assert abs(int(out[1].mean()) - 99) <= 1
    os.remove(sneaky)


def test_full_judge_skips_corrupt_and_reports(mixed_dir, tmp_path, capsys):
    predictor = _make_predictor(mixed_dir)
    out_csv = tmp_path / "judge.csv"
    acc = full_judge(predictor, mixed_dir, str(out_csv), batch_size=4,
                     progress=False, canvas_cache="off")
    lines = out_csv.read_text().strip().splitlines()
    assert len(lines) == 1 + 8  # header + 2 classes x 4 good images
    names = {line.split(",")[0] for line in lines[1:]}
    assert not names & {"truncated.jpg", "garbage.jpg", "empty.jpg"}
    assert 0.0 <= acc <= 1.0
    assert "skipped 3 undecodable image(s)" in capsys.readouterr().out


def test_full_judge_corrupt_never_poisons_canvas_cache(mixed_dir, tmp_path,
                                                       capsys):
    """With canvas_cache='on', an undecodable file's slot must not be marked
    done (a zeroed canvas silently judged as a real image on every later
    sweep); the second run must skip it again, with identical CSVs."""
    predictor = _make_predictor(mixed_dir)
    csv1, csv2 = tmp_path / "j1.csv", tmp_path / "j2.csv"
    full_judge(predictor, mixed_dir, str(csv1), batch_size=4,
               progress=False, canvas_cache="on")
    assert "skipped 3 undecodable" in capsys.readouterr().out
    full_judge(predictor, mixed_dir, str(csv2), batch_size=4,
               progress=False, canvas_cache="on")
    assert "skipped 3 undecodable" in capsys.readouterr().out
    assert csv1.read_text() == csv2.read_text()
    shutil.rmtree(os.path.join(mixed_dir, ".tic_canvas_cache"))


def test_training_loader_stays_strict(mixed_dir):
    """HostImageLoader must raise on the corrupt batch, not feed zeros."""
    index = scan_image_folder(mixed_dir, persist_class_map=False)
    loader = L.HostImageLoader(index, batch_size=len(index), canvas=(32, 32),
                               shuffle=False, drop_last=False)
    with pytest.raises(Exception):
        for _ in loader:
            pass


def test_loader_skip_mode_masks_corrupt_slots(mixed_dir):
    """on_error='skip': corrupt slots leave the batch via the mask (labels
    of good slots untouched), instead of aborting or feeding zero images."""
    index = scan_image_folder(mixed_dir, persist_class_map=False)
    loader = L.HostImageLoader(index, batch_size=len(index), canvas=(32, 32),
                               shuffle=False, drop_last=False,
                               on_error="skip")
    (batch,) = list(loader)
    assert int(batch["mask"].sum()) == 8  # 2 classes x 4 good images
    good = batch["image"][batch["mask"]]
    assert all(im.any() for im in good), "good slots must hold real pixels"
    bad_names = {"truncated.jpg", "garbage.jpg", "empty.jpg"}
    order = [os.path.basename(index.paths[i]) for i in loader.subset]
    expect = np.asarray([name not in bad_names for name in order])
    np.testing.assert_array_equal(batch["mask"], expect)


def test_loader_skip_mode_never_caches_corrupt(mixed_dir):
    """A corrupt slot must not be stored in the canvas cache: the warm pass
    would otherwise fetch done=1 zeros and report the slot as valid."""
    index = scan_image_folder(mixed_dir, persist_class_map=False)

    def run():
        loader = L.HostImageLoader(
            index, batch_size=len(index), canvas=(32, 32), shuffle=False,
            drop_last=False, on_error="skip", canvas_cache=True)
        (batch,) = list(loader)
        loader._cache.flush()
        return batch

    try:
        cold, warm = run(), run()
        np.testing.assert_array_equal(cold["mask"], warm["mask"])
        assert int(warm["mask"].sum()) == 8
        np.testing.assert_array_equal(cold["image"], warm["image"])
    finally:
        shutil.rmtree(os.path.join(mixed_dir, ".tic_canvas_cache"),
                      ignore_errors=True)


def test_mean_std_survives_corrupt_corpus(mixed_dir, tmp_path):
    """calculate_mean_std must exclude undecodable files from the statistics
    — same numbers as a clean copy of the corpus (the serve-path repro:
    init() computes stats over the judged directory before full_judge)."""
    from touhouimageclassification_tpu.utils.mean_std import calculate_mean_std

    clean = str(tmp_path / "clean")
    shutil.copytree(mixed_dir, clean)
    for n in ("truncated.jpg", "garbage.jpg", "empty.jpg"):
        os.remove(os.path.join(clean, "class_00", n))
    m1, s1 = calculate_mean_std(mixed_dir, (32, 32), batch_size=4, cache=False)
    m2, s2 = calculate_mean_std(clean, (32, 32), batch_size=4, cache=False)
    np.testing.assert_allclose(m1, m2)
    np.testing.assert_allclose(s1, s2)
    assert np.all(np.isfinite(m1)) and np.all(s1 > 0)


def test_serve_init_survives_corrupt_corpus(mixed_dir, tmp_path):
    """End-to-end repro of the judging entry point: serve.init over a corpus
    with corrupt files (no cached stats, no serving_meta) must compute
    mean/std instead of crashing in the strict loader."""
    from touhouimageclassification_tpu.infer import serve as S
    from touhouimageclassification_tpu.train.checkpoint import save_params

    out = str(tmp_path / "params")
    model = ViT(TINY)
    params = model.init(jax.random.key(0),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    save_params(out, {"params": params})
    orig = S.get_model
    S.get_model = lambda mt, n: ViT(TINY)
    try:
        pred = S.init(modelt="vit-base", weights=out, data_dir=mixed_dir)
    finally:
        S.get_model = orig
        cache = os.path.join(mixed_dir, "meta_mean_std.json")
        if os.path.exists(cache):
            os.remove(cache)
    assert np.all(np.isfinite(pred.mean)) and np.all(pred.std > 0)


def test_mean_std_all_corrupt_raises_clearly(tmp_path):
    from touhouimageclassification_tpu.utils.mean_std import calculate_mean_std

    cdir = os.path.join(str(tmp_path / "allbad"), "class_00")
    os.makedirs(cdir)
    _write_corrupt_files(cdir)
    with pytest.raises(ValueError, match="no decodable images"):
        calculate_mean_std(str(tmp_path / "allbad"), (32, 32), cache=False)
