"""Serving path: Predictor buckets, full_judge CSV schema, filter copying."""
import csv
import os

import jax
import numpy as np
import pytest

from touhouimageclassification_tpu.config import ViTConfig
from touhouimageclassification_tpu.data.folder import scan_image_folder
from touhouimageclassification_tpu.infer.filter import filter as filter_csv
from touhouimageclassification_tpu.infer.serve import Predictor, full_judge, serve
from touhouimageclassification_tpu.models.vit import ViT

from fixtures import make_image_folder

N_CLASSES = 3
TINY = ViTConfig(image_size=32, patch_size=8, hidden_size=32, num_layers=1,
                 num_heads=2, mlp_dim=64, num_classes=N_CLASSES)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_data")
    return make_image_folder(str(root), num_classes=N_CLASSES, per_class=5, size=32)


@pytest.fixture(scope="module")
def predictor(dataset):
    index = scan_image_folder(dataset)
    model = ViT(TINY)
    params = model.init(jax.random.key(0), np.zeros((1, 32, 32, 3), np.float32))["params"]
    return Predictor(
        model=model, params=params, model_state={},
        class_to_idx=index.class_to_idx, image_size=(32, 32),
        mean=np.array([0.5, 0.5, 0.5]), std=np.array([0.25, 0.25, 0.25]),
    )


def test_predict_bucket_padding(predictor):
    for n in (1, 3, 8, 11):
        imgs = np.random.default_rng(n).integers(0, 256, (n, 32, 32, 3)).astype(np.uint8)
        pred, conf = predictor.predict_array(imgs)
        assert pred.shape == (n,) and conf.shape == (n,)
        assert ((conf > 0) & (conf <= 1)).all()


def test_predict_over_largest_bucket(predictor):
    imgs = np.zeros((70, 32, 32, 3), np.uint8)
    pred, conf = predictor.predict_array(imgs)
    assert pred.shape == (70,)
    # identical inputs -> identical predictions regardless of chunking
    assert len(set(pred.tolist())) == 1


def test_padding_does_not_change_results(predictor):
    imgs = np.random.default_rng(0).integers(0, 256, (8, 32, 32, 3)).astype(np.uint8)
    full_pred, full_conf = predictor.predict_array(imgs)
    one_pred, one_conf = predictor.predict_array(imgs[:1])
    assert full_pred[0] == one_pred[0]
    np.testing.assert_allclose(full_conf[0], one_conf[0], atol=1e-5)


def test_mesh_sharded_predictor_matches_single_device(predictor, dataset):
    """Predictor(mesh=...) shards judge batches over the 'data' axis (params
    replicated) — predictions/confidences must equal the single-device path;
    buckets smaller than the mesh are replicated instead."""
    from touhouimageclassification_tpu.parallel.mesh import create_mesh

    index = scan_image_folder(dataset)
    model = ViT(TINY)
    params = model.init(jax.random.key(0),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    mesh = create_mesh(num_data=8)
    sharded = Predictor(
        model=model, params=params, model_state={},
        class_to_idx=index.class_to_idx, image_size=(32, 32),
        mean=np.array([0.5, 0.5, 0.5]), std=np.array([0.25, 0.25, 0.25]),
        mesh=mesh,
    )
    for n in (1, 3, 8, 64):  # 1 and 3 pad to bucket 1/8; 8 and 64 shard
        imgs = np.random.default_rng(n).integers(
            0, 256, (n, 32, 32, 3)).astype(np.uint8)
        p1, c1 = predictor.predict_array(imgs)
        p8, c8 = sharded.predict_array(imgs)
        np.testing.assert_array_equal(p1, p8)
        np.testing.assert_allclose(c1, c8, atol=1e-5)
    # the 64-bucket judge batch is actually batch-sharded over the mesh
    put = sharded._put_batch(np.zeros((64, 32, 32, 3), np.uint8))
    assert len(put.sharding.device_set) == 8


def test_serve_single_image(predictor, dataset):
    from PIL import Image

    index = scan_image_folder(dataset)
    with Image.open(index.paths[0]) as im:
        name, conf = serve(predictor, im)
    assert name in index.class_to_idx
    assert 0 < conf <= 1


def test_full_judge_csv_schema_and_filter(predictor, dataset, tmp_path):
    out_csv = tmp_path / "judge.csv"
    acc = full_judge(predictor, dataset, str(out_csv), batch_size=8, progress=False)
    assert 0.0 <= acc <= 1.0
    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    assert rows, "no rows written"
    assert list(rows[0].keys()) == [
        "filename", "predicted_class", "confidence", "actual_class", "correct", "path"
    ]
    n_correct = sum(r["correct"] == "True" for r in rows)
    assert abs(n_correct / len(rows) - acc) < 1e-9

    out_dir = tmp_path / "filtered"
    tot, cnt = filter_csv(str(out_csv), str(out_dir))
    assert tot == len(rows) and cnt == n_correct
    copied = sum(len(files) for _, _, files in os.walk(out_dir))
    assert copied == cnt


def test_full_judge_canvas_cache(predictor, tmp_path_factory, tmp_path, monkeypatch):
    """canvas_cache='on' builds the dataset's decoded-canvas memmap during
    the judge; a second 'auto' judge hits it for every image (zero decodes)
    and reproduces the same predictions."""
    import touhouimageclassification_tpu.data.loader as L

    root = tmp_path_factory.mktemp("judge_cache_data")
    data = make_image_folder(str(root), num_classes=N_CLASSES, per_class=5, size=32)

    csv_on = tmp_path / "on.csv"
    acc_on = full_judge(predictor, data, str(csv_on), batch_size=8,
                        progress=False, canvas_cache="on")
    assert os.path.isdir(os.path.join(data, ".tic_canvas_cache"))

    decodes = []
    real = L.decode_batch_into
    monkeypatch.setattr(L, "decode_batch_into",
                        lambda *a, **k: decodes.append(a) or real(*a, **k))
    csv_auto = tmp_path / "auto.csv"
    acc_auto = full_judge(predictor, data, str(csv_auto), batch_size=8,
                          progress=False, canvas_cache="auto")
    assert not decodes, "warm canvas cache must skip every decode"
    assert acc_auto == acc_on
    assert csv_auto.read_text() == csv_on.read_text()


def test_full_judge_staged_over_mesh_matches_single_device(predictor, dataset,
                                                           tmp_path):
    """full_judge stages batch uploads from the prefetch thread; over a
    --dp mesh the staged buffer must carry the data sharding and produce
    the same CSV as the single-device judge."""
    from touhouimageclassification_tpu.parallel.mesh import create_mesh

    index = scan_image_folder(dataset)
    model = ViT(TINY)
    params = model.init(jax.random.key(0),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    sharded = Predictor(
        model=model, params=params, model_state={},
        class_to_idx=index.class_to_idx, image_size=(32, 32),
        mean=np.array([0.5, 0.5, 0.5]), std=np.array([0.25, 0.25, 0.25]),
        mesh=create_mesh(num_data=8),
    )
    csv_one = tmp_path / "one.csv"
    csv_mesh = tmp_path / "mesh.csv"
    full_judge(predictor, dataset, str(csv_one), batch_size=8, progress=False)
    full_judge(sharded, dataset, str(csv_mesh), batch_size=8, progress=False)
    assert csv_mesh.read_text() == csv_one.read_text()
    staged = sharded.stage(np.zeros((8, 32, 32, 3), np.uint8))
    assert len(staged.sharding.device_set) == 8


def test_full_judge_auto_without_cache_never_allocates(predictor, dataset,
                                                       tmp_path):
    """'auto' on a dataset with no existing cache judges plainly — no
    surprise multi-GB memmap allocation from a read-only scoring pass."""
    acc = full_judge(predictor, dataset, str(tmp_path / "j.csv"), batch_size=8,
                     progress=False, canvas_cache="auto")
    assert 0.0 <= acc <= 1.0
    assert not os.path.isdir(os.path.join(dataset, ".tic_canvas_cache"))


def test_serving_meta_roundtrip(dataset, tmp_path):
    """export_for_serving writes the training-time normalization stats and
    serve.init picks them up instead of dataset statistics."""
    import json
    import os

    from touhouimageclassification_tpu.train.checkpoint import save_params

    out = str(tmp_path / "served")
    model = ViT(TINY)
    params = model.init(jax.random.key(0),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    save_params(out, {"params": params})
    with open(os.path.join(out, "serving_meta.json"), "w") as f:
        json.dump({"model_type": "vit-base", "epoch": 1,
                   "mean": [0.1, 0.2, 0.3], "std": [0.5, 0.5, 0.5],
                   "normalize_stats": "imagenet"}, f)

    from touhouimageclassification_tpu.infer import serve as S

    # patch model construction to the tiny config so init() works end-to-end
    orig = S.get_model
    S.get_model = lambda mt, n: ViT(TINY)
    try:
        pred = S.init(modelt="vit-base", weights=out, data_dir=dataset)
    finally:
        S.get_model = orig
    np.testing.assert_allclose(pred.mean, [0.1, 0.2, 0.3])
    np.testing.assert_allclose(pred.std, [0.5, 0.5, 0.5])


def test_init_infers_moe_member_count_from_pth(tmp_path, monkeypatch):
    """serve.init with a reference MoE .pth whose expert count differs from
    the MoEConfig default must rebuild the model from the checkpoint's count
    (the count lives in the state dict, not the config)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from touhouimageclassification_tpu.config import MoEConfig
    from touhouimageclassification_tpu.infer import serve as S
    from touhouimageclassification_tpu.models.resmoe import MoEClassifier

    n_cls = 5
    tiny = ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                     num_layers=2, num_heads=4, mlp_dim=128, num_classes=n_cls)

    def hf_cfg(nl):
        return transformers.ViTConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, image_size=32, patch_size=16, num_labels=nl)

    class TorchMoE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.experts = torch.nn.ModuleList([
                transformers.ViTForImageClassification(hf_cfg(n_cls))
                for _ in range(3)])
            gate = torch.nn.Module()
            gate.vit = transformers.ViTForImageClassification(hf_cfg(3))
            self.gate = gate

    torch.manual_seed(0)
    pth = tmp_path / "moe3.pth"
    torch.save(TorchMoE().state_dict(), pth)

    data = make_image_folder(str(tmp_path / "d"), num_classes=n_cls,
                             per_class=1, size=32)

    seen_overrides = []

    def fake_create(model_type, num_classes, **ov):
        seen_overrides.append(ov)
        return MoEClassifier(MoEConfig(
            num_experts=ov.get("num_experts", 8), top_k=2,
            num_classes=num_classes, expert_vit=tiny))

    monkeypatch.setattr(S, "create_model", fake_create)
    pred = S.init(modelt="resmoe", weights=str(pth), data_dir=data)
    assert {"num_experts": 3} in seen_overrides
    assert pred.params["experts"]["cls_token"].shape[0] == 3


def test_judge_csv_quotes_commas(tmp_path):
    """full_judge writes with csv.writer and filter reads with DictReader: a
    comma in a filename must survive the round trip instead of shifting
    every later column."""
    import shutil as _sh

    from touhouimageclassification_tpu.infer.filter import filter as tic_filter

    data = make_image_folder(str(tmp_path / "commas"),
                             num_classes=N_CLASSES, per_class=3, size=32)
    src = os.path.join(data, "class_00", "0.jpg")
    _sh.copy(src, os.path.join(data, "class_00", "a,b.jpg"))
    index = scan_image_folder(data, persist_class_map=False)
    model = ViT(TINY)
    params = model.init(jax.random.key(0),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    predictor = Predictor(
        model=model, params=params, model_state={},
        class_to_idx=index.class_to_idx, image_size=(32, 32),
        mean=np.array([0.5] * 3), std=np.array([0.25] * 3),
    )
    out_csv = tmp_path / "judge.csv"
    full_judge(predictor, data, str(out_csv), batch_size=4, progress=False,
               canvas_cache="off")
    import csv as _csv

    rows = list(_csv.DictReader(open(out_csv)))
    assert len(rows) == N_CLASSES * 3 + 1
    byname = {r["filename"]: r for r in rows}
    assert "a,b.jpg" in byname
    r = byname["a,b.jpg"]
    assert r["actual_class"] == "class_00"
    assert r["path"].endswith("a,b.jpg")
    assert r["correct"] in ("True", "False")
    # and the filter keeps/drops it by the correct column, not a shifted one
    out_dir = tmp_path / "filtered"
    tic_filter(str(out_csv), str(out_dir))
    kept = {p.name for p in out_dir.rglob("*.jpg")}
    if r["correct"] == "True":
        assert "a,b.jpg" in kept
    else:
        assert "a,b.jpg" not in kept
