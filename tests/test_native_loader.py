"""Native JPEG decode+resize: parity with the PIL path and batch API."""
import glob
import os

import numpy as np
import pytest
from PIL import Image

from touhouimageclassification_tpu.data import native_loader
from touhouimageclassification_tpu.data.loader import HostImageLoader, decode_image
from touhouimageclassification_tpu.data.folder import scan_image_folder

from fixtures import make_image_folder

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native toolchain/libjpeg unavailable"
)


@pytest.fixture(scope="module")
def jpgs(tmp_path_factory):
    root = tmp_path_factory.mktemp("njpg")
    rng = np.random.default_rng(0)
    paths = []
    for i, size in enumerate([(64, 64), (128, 96), (33, 47)]):
        arr = rng.integers(0, 256, (*size, 3)).astype(np.uint8)
        p = str(root / f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)
    return paths


def test_decode_file_close_to_pil(jpgs):
    for p in jpgs:
        ours = native_loader.decode_file(p, (48, 48)).astype(np.int16)
        pil = decode_image(p, (48, 48)).astype(np.int16)
        # different resample kernels; content must agree closely on average
        mad = np.abs(ours - pil).mean()
        assert mad < 14.0, f"{p}: mean abs diff {mad}"


def test_decode_batch(jpgs):
    out, failures = native_loader.decode_batch(jpgs, (32, 32))
    assert failures == 0
    assert out.shape == (3, 32, 32, 3)
    assert out.dtype == np.uint8
    assert all(out[i].any() for i in range(3))


def test_decode_batch_failure_slot(tmp_path, jpgs):
    bad = str(tmp_path / "missing.jpg")
    out, failures = native_loader.decode_batch([jpgs[0], bad], (16, 16))
    assert failures == 1
    assert out[0].any() and not out[1].any()


def test_host_loader_native_backend(tmp_path):
    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=4, size=40)
    index = scan_image_folder(root)
    loader = HostImageLoader(index, batch_size=4, canvas=(32, 32), shuffle=False,
                             drop_last=False, decode_backend="native")
    assert loader._native is not None
    batches = list(loader)
    assert batches[0]["image"].shape == (4, 32, 32, 3)
    assert batches[0]["image"].any()
    # parity with the PIL backend on the same files
    pil_loader = HostImageLoader(index, batch_size=4, canvas=(32, 32), shuffle=False,
                                 drop_last=False, decode_backend="pil")
    pil_batches = list(pil_loader)
    mad = np.abs(batches[0]["image"].astype(np.int16)
                 - pil_batches[0]["image"].astype(np.int16)).mean()
    assert mad < 14.0


def test_canvas_cache_fills_and_serves(tmp_path):
    """Epoch 1 decodes + fills the memmap; epoch 2 must serve identical
    batches from the cache without touching the decoder."""
    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=4, size=40)
    index = scan_image_folder(root)
    loader = HostImageLoader(index, batch_size=4, canvas=(32, 32), shuffle=False,
                             drop_last=False, canvas_cache=True)
    epoch1 = [b["image"].copy() for b in loader]
    assert loader._cache.hit_rate() == 1.0

    # break the decoder: cached epochs must never call it
    loader._decode_into = None
    epoch2 = [b["image"].copy() for b in loader]
    for a, b in zip(epoch1, epoch2):
        np.testing.assert_array_equal(a, b)


def test_canvas_cache_invalidated_on_dataset_change(tmp_path):
    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=3, size=40)
    index = scan_image_folder(root)
    l1 = HostImageLoader(index, batch_size=3, canvas=(32, 32), shuffle=False,
                         drop_last=False, canvas_cache=True)
    list(l1)
    assert l1._cache.hit_rate() == 1.0
    # grow the dataset -> fingerprint changes -> fresh, empty cache
    make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=5, size=40, seed=7)
    index2 = scan_image_folder(root)
    l2 = HostImageLoader(index2, batch_size=5, canvas=(32, 32), shuffle=False,
                         drop_last=False, canvas_cache=True)
    assert l2._cache.hit_rate() == 0.0
    batches = list(l2)
    assert l2._cache.hit_rate() == 1.0
    assert all(b["image"].any() for b in batches)


def test_cache_dir_is_not_a_class(tmp_path):
    """Rescanning a dataset after the canvas cache was created must not grow
    the class list or shift label ids (.tic_canvas_cache lives under root)."""
    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=3, size=40)
    index = scan_image_folder(root, persist_class_map=False)
    loader = HostImageLoader(index, batch_size=3, canvas=(32, 32), shuffle=False,
                             drop_last=False, canvas_cache=True)
    list(loader)
    assert os.path.isdir(os.path.join(root, ".tic_canvas_cache"))
    index2 = scan_image_folder(root, persist_class_map=False)
    assert index2.classes == index.classes
    np.testing.assert_array_equal(index2.labels, index.labels)


def test_missing_data_file_resets_done_map(tmp_path):
    """A surviving .done map without its .data file must not report hits
    (it would serve all-black canvases)."""
    from touhouimageclassification_tpu.data.canvas_cache import CanvasCache

    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=3, size=40)
    index = scan_image_folder(root, persist_class_map=False)
    c1 = CanvasCache(index, (32, 32))
    imgs = np.full((len(index), 32, 32, 3), 7, np.uint8)
    c1.store(np.arange(len(index)), imgs)
    assert c1.hit_rate() == 1.0
    del c1
    os.remove(os.path.join(root, ".tic_canvas_cache", "32x32.data"))
    c2 = CanvasCache(index, (32, 32))
    assert c2.hit_rate() == 0.0


def test_same_size_replacement_invalidates_cache(tmp_path):
    """Replacing an image in-place (same byte size, different mtime) must
    invalidate the cache — the fingerprint includes mtime."""
    from touhouimageclassification_tpu.data.canvas_cache import CanvasCache

    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=3, size=40)
    index = scan_image_folder(root, persist_class_map=False)
    c1 = CanvasCache(index, (32, 32))
    c1.store(np.arange(len(index)), np.full((len(index), 32, 32, 3), 7, np.uint8))
    del c1
    os.utime(index.paths[0], ns=(1, 1))  # same bytes, different mtime
    c2 = CanvasCache(index, (32, 32))
    assert c2.hit_rate() == 0.0


def test_crashed_writer_resets_done_map(tmp_path):
    """A dirty-marker left by a DEAD writer process must reset the done map
    (the kernel may have persisted done=1 flags before their canvas pages)."""
    from touhouimageclassification_tpu.data.canvas_cache import CanvasCache

    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=3, size=40)
    index = scan_image_folder(root, persist_class_map=False)
    c1 = CanvasCache(index, (32, 32))
    c1.store(np.arange(len(index)), np.full((len(index), 32, 32, 3), 7, np.uint8))
    assert c1.hit_rate() == 1.0
    # same-process reopen (dirty marker carries OUR pid): hits survive
    c2 = CanvasCache(index, (32, 32))
    assert c2.hit_rate() == 1.0
    # simulate a crashed foreign writer: dead pid in the dirty marker
    with open(c2._dirty_path, "w") as f:
        f.write("999999999")
    c3 = CanvasCache(index, (32, 32))
    assert c3.hit_rate() == 0.0


def test_per_pid_dirty_markers(tmp_path):
    """Per-process markers: a dead foreign writer's marker triggers a reset
    and is consumed; our own / live markers are ignored; one writer's clean
    exit never clobbers another's marker (the old single-file protocol's
    hole)."""
    from touhouimageclassification_tpu.data.canvas_cache import CanvasCache

    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=3, size=40)
    index = scan_image_folder(root, persist_class_map=False)
    c1 = CanvasCache(index, (32, 32))
    c1.store(np.arange(len(index)), np.full((len(index), 32, 32, 3), 7, np.uint8))
    assert os.path.exists(c1._own_dirty_path)
    assert c1._own_dirty_path.startswith(f"{c1._dirty_path}.{os.getpid()}.")

    # dead foreign writer alongside our live marker
    stale = f"{c1._dirty_path}.999999999"
    with open(stale, "w"):
        pass
    c2 = CanvasCache(index, (32, 32))
    assert c2.hit_rate() == 0.0          # reset triggered
    assert not os.path.exists(stale)     # stale marker consumed
    assert os.path.exists(c1._own_dirty_path)  # ours survives

    # clean exit removes only OUR marker
    c2._mark_clean()
    foreign = f"{c2._dirty_path}.999999998"
    with open(foreign, "w"):
        pass
    c2._mark_dirty()
    c2._mark_clean()
    assert os.path.exists(foreign)


def test_collected_cache_drops_its_marker(tmp_path):
    """A cache garbage-collected before process exit must remove its dirty
    marker — otherwise the NEXT process misreads the clean run as a crash
    and refills from scratch (bug found driving full_judge twice on the
    chip: the second CLI run reported '0% warm')."""
    import gc

    from touhouimageclassification_tpu.data.canvas_cache import CanvasCache

    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=3, size=40)
    index = scan_image_folder(root, persist_class_map=False)
    c1 = CanvasCache(index, (32, 32))
    c1.store(np.arange(len(index)), np.full((len(index), 32, 32, 3), 7, np.uint8))
    marker, dirty_prefix = c1._own_dirty_path, c1._dirty_path
    del c1
    gc.collect()
    assert not os.path.exists(marker)
    assert not glob.glob(dirty_prefix + ".*"), "no marker may survive GC"
    # a 'foreign' reader (our own pid is skipped, so fake a dead one on any
    # leftover) sees a clean cache: hits survive
    c2 = CanvasCache(index, (32, 32))
    assert c2.hit_rate() == 1.0


def test_readonly_consumer_never_marks_dirty(tmp_path):
    """A warm cache read by a pure consumer (100%-hit judge pass) must hold
    NO dirty marker — a SIGKILL mid-read would otherwise make the next
    reader discard and refill a valid multi-GB cache."""
    from touhouimageclassification_tpu.data.canvas_cache import CanvasCache

    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=3, size=40)
    index = scan_image_folder(root, persist_class_map=False)
    c1 = CanvasCache(index, (32, 32))
    ids = np.arange(len(index))
    c1.store(ids, np.full((len(index), 32, 32, 3), 7, np.uint8))
    c1.flush()
    reader = CanvasCache(index, (32, 32))
    assert reader.hit_rate() == 1.0
    out = np.empty((len(index), 32, 32, 3), np.uint8)
    assert reader.fetch(ids, out).all()
    assert not glob.glob(reader._dirty_path + ".*"), (
        "read-only access must not create a dirty marker")


def test_find_existing_canvas_size_preference(tmp_path):
    """Cache discovery never returns a canvas smaller than the consumer's
    input (upscaled pixels would change predictions), prefers an exact
    match, and otherwise the smallest sufficient canvas."""
    from touhouimageclassification_tpu.data.canvas_cache import (
        CanvasCache, find_existing_canvas)

    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=3, size=40)
    index = scan_image_folder(root, persist_class_map=False)
    for canvas in ((24, 24), (32, 32), (48, 48)):
        CanvasCache(index, canvas).store(
            np.arange(len(index)),
            np.zeros((len(index), *canvas, 3), np.uint8))

    assert find_existing_canvas(index, min_size=(32, 32)) == (32, 32)
    assert find_existing_canvas(index, min_size=(28, 28)) == (32, 32)
    assert find_existing_canvas(index, min_size=(64, 64)) is None
    assert find_existing_canvas(index) == (24, 24)  # unconstrained: smallest
    # stale caches are never candidates
    os.utime(index.paths[0], ns=(1, 1))
    index2 = scan_image_folder(root, persist_class_map=False)
    assert find_existing_canvas(index2, min_size=(32, 32)) is None


def test_flush_then_store_remarks_dirty(tmp_path):
    """flush() drops the marker while the cache stays alive; the next
    store() must re-mark dirty BEFORE writing so a crash mid-write is
    detectable."""
    from touhouimageclassification_tpu.data.canvas_cache import CanvasCache

    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=3, size=40)
    index = scan_image_folder(root, persist_class_map=False)
    c1 = CanvasCache(index, (32, 32))
    ids = np.arange(len(index))
    c1.store(ids[:2], np.full((2, 32, 32, 3), 7, np.uint8))
    c1.flush()
    assert not glob.glob(c1._dirty_path + ".*")
    c1.store(ids[2:4], np.full((2, 32, 32, 3), 9, np.uint8))
    assert os.path.exists(c1._own_dirty_path)


def test_free_space_guard_applies_to_stale_rebuild(tmp_path, monkeypatch):
    """A stale cache being REBUILT (fingerprint mismatch) re-enters the
    create path, so the free-space guard must fire then too — not only when
    no .data file existed at entry (advisor round-2 finding)."""
    from touhouimageclassification_tpu.data import canvas_cache as cc

    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=3, size=40)
    index = scan_image_folder(root, persist_class_map=False)
    cc.CanvasCache(index, (32, 32))  # valid cache exists on disk

    # dataset grows -> fingerprint mismatch -> rebuild path
    make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=6, size=40, seed=3)
    index2 = scan_image_folder(root, persist_class_map=False)

    class FakeStat:
        f_bavail = 1
        f_frsize = 512

    monkeypatch.setattr(cc.os, "statvfs", lambda _: FakeStat())
    with pytest.raises(RuntimeError, match="free"):
        cc.CanvasCache(index2, (32, 32))


def test_cache_requires_free_disk(tmp_path, monkeypatch):
    """Creating a cache bigger than the free disk must raise a clear error
    instead of SIGBUS-ing mid-epoch on a sparse file."""
    from touhouimageclassification_tpu.data import canvas_cache as cc

    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=3, size=40)
    index = scan_image_folder(root, persist_class_map=False)

    class FakeStat:
        f_bavail = 1
        f_frsize = 512  # 512 bytes free

    monkeypatch.setattr(cc.os, "statvfs", lambda _: FakeStat())
    with pytest.raises(RuntimeError, match="free"):
        cc.CanvasCache(index, (32, 32))


def test_decode_batch_rejects_bad_buffers(jpgs):
    """The C side writes n*h*w*3 bytes (and failed[0:n]) blind — undersized
    or mistyped caller buffers must raise instead of corrupting the heap."""
    n = len(jpgs)
    with pytest.raises(ValueError, match="failed"):
        native_loader.decode_batch(jpgs, (32, 32),
                                   failed=np.zeros(n - 1, np.uint8))
    with pytest.raises(ValueError, match="failed"):
        native_loader.decode_batch(jpgs, (32, 32),
                                   failed=np.zeros(n, np.int32))
    with pytest.raises(ValueError, match="out"):
        native_loader.decode_batch(
            jpgs, (32, 32), out=np.empty((n - 1, 32, 32, 3), np.uint8))
    with pytest.raises(ValueError, match="out"):
        native_loader.decode_batch(
            jpgs, (32, 32), out=np.empty((n, 48, 48, 3), np.uint8))
    with pytest.raises(ValueError, match="out"):
        native_loader.decode_batch(
            jpgs, (32, 32),
            out=np.empty((n, 32, 32, 4), np.uint8)[..., :3])  # non-contiguous
    # the valid shapes still work
    out, failures = native_loader.decode_batch(
        jpgs, (32, 32), out=np.empty((n, 32, 32, 3), np.uint8),
        failed=np.zeros(n, np.uint8))
    assert failures == 0 and out.any()


def test_stale_marker_consumed_by_fresh_rebuild(tmp_path):
    """A dead writer's dirty marker must be consumed even when the .data
    file is built fresh — otherwise the marker survives a clean full rebuild
    and the NEXT process discards the valid fill ('0% warm' again)."""
    from touhouimageclassification_tpu.data import canvas_cache as cc

    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=3,
                             size=40)
    index = scan_image_folder(root, persist_class_map=False)
    cache_root = os.path.join(root, ".tic_canvas_cache")
    os.makedirs(cache_root)
    # marker from a dead writer, planted BEFORE the first (fresh) build
    with open(os.path.join(cache_root, "32x32.dirty.999999.0"), "w") as f:
        f.write("999999")
    c1 = cc.CanvasCache(index, (32, 32))
    ids = np.arange(len(index))
    out = np.empty((len(index), 32, 32, 3), np.uint8)
    c1.fetch(ids, out)  # all misses
    from touhouimageclassification_tpu.data.loader import decode_batch_into

    decode_batch_into(list(index.paths), (32, 32), out)
    c1.store(ids, out)
    c1.flush()
    # the stale marker must be gone; a second process sees a warm cache
    assert not glob.glob(os.path.join(cache_root, "*.dirty*"))
    c2 = cc.CanvasCache(index, (32, 32))
    hit = c2.fetch(ids, np.empty_like(out))
    assert hit.all(), "fresh rebuild was discarded by a stale marker"


def test_find_existing_canvas_with_fingerprint(tmp_path):
    from touhouimageclassification_tpu.data import canvas_cache as cc

    root = make_image_folder(str(tmp_path / "d"), num_classes=2, per_class=2,
                             size=40)
    index = scan_image_folder(root, persist_class_map=False)
    canvas, fp = cc.find_existing_canvas(index, with_fingerprint=True)
    # no cache dir -> nothing was statted: no fingerprint to hand over
    # (CanvasCache(fingerprint=None) computes its own; billing every
    # cache-less judge startup a full-corpus stat sweep is the regression
    # this contract avoids)
    assert canvas is None and fp is None
    c = cc.CanvasCache(index, (32, 32), fingerprint=fp)
    c.flush()
    canvas2, fp2 = cc.find_existing_canvas(index, with_fingerprint=True)
    assert canvas2 == (32, 32) and isinstance(fp2, str) and fp2
    assert cc.find_existing_canvas(index) == (32, 32)  # plain form unchanged


def test_pretrained_rejects_sharded_snapshot(tmp_path):
    from touhouimageclassification_tpu.utils import pretrained as P

    cand = tmp_path / "models--google--vit-base-patch16-224-in21k"
    os.makedirs(cand / "snap")
    for n in ("pytorch_model-00001-of-00002.bin",
              "pytorch_model-00002-of-00002.bin"):
        (cand / "snap" / n).write_bytes(b"x")
    with pytest.raises(ValueError, match="sharded"):
        P.load_pretrained_backbone("vit-base", 3, cache_dir=str(tmp_path))
