"""Multi-host input sharding: process-sharded loading + global assembly.

SURVEY §5 scaling obligation (the scaling-book input-pipeline recipe): under
multi-process JAX every host decodes only the rows its devices own, and
``put_global`` assembles the global batch. These tests pin the host-side
arithmetic single-process by forcing explicit ``(pid, count)`` views; the
real two-process path is exercised in ``test_multihost.py``.
"""
import numpy as np
import pytest

from touhouimageclassification_tpu.data.folder import scan_image_folder
from touhouimageclassification_tpu.data.loader import HostImageLoader

from fixtures import make_image_folder


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp_data")
    return make_image_folder(str(root), num_classes=3, per_class=7, size=16)


def _rows(batch):
    """(label, pixels) keys of the VALID rows of a batch."""
    return [
        (int(batch["label"][j]), batch["image"][j].tobytes())
        for j in range(len(batch["mask"]))
        if batch["mask"][j]
    ]


def test_process_shards_partition_each_global_batch(dataset):
    """Per step, the union of the P per-process local batches must be exactly
    the single-process global batch (strided slices of one shared epoch
    permutation — the DistributedSampler contract)."""
    index = scan_image_folder(dataset)
    kw = dict(batch_size=4, canvas=(16, 16), shuffle=True, seed=3,
              drop_last=False)
    ref = list(HostImageLoader(index, process_shard=(0, 1), **kw))
    parts = [list(HostImageLoader(index, process_shard=(p, 2), **kw))
             for p in range(2)]
    assert len(parts[0]) == len(parts[1]) == len(ref) > 1
    for i, rb in enumerate(ref):
        got = sorted(r for p in parts for r in _rows(p[i]))
        assert got == sorted(_rows(rb)), f"batch {i} shards != global batch"
        for p in parts:
            assert p[i]["image"].shape == (2, 16, 16, 3)


def test_ragged_tail_stays_lockstep(dataset):
    """A process whose share of the global tail is empty still yields an
    all-masked batch, so step counts (and collectives) match everywhere."""
    index = scan_image_folder(dataset)
    kw = dict(subset=np.arange(9), batch_size=8, canvas=(16, 16),
              shuffle=False)
    parts = [list(HostImageLoader(index, process_shard=(p, 4),
                                  drop_last=False, **kw))
             for p in range(4)]
    assert [len(p) for p in parts] == [2, 2, 2, 2]
    tails = [p[1] for p in parts]
    assert sum(int(t["mask"].sum()) for t in tails) == 1  # global tail = 1 img
    assert all(t["image"].shape == (2, 16, 16, 3) for t in tails)
    # drop_last drops the global tail on every process alike
    parts = [list(HostImageLoader(index, process_shard=(p, 4),
                                  drop_last=True, **kw))
             for p in range(4)]
    assert [len(p) for p in parts] == [1, 1, 1, 1]


def test_loader_sharding_property(dataset):
    """Randomized sweep over (subset size, batch, process count, drop_last,
    seed): per-step shard unions always equal the single-process batch and
    every process yields the same number of batches."""
    import random

    index = scan_image_folder(dataset)
    rng = random.Random(0)
    for _ in range(15):
        n = rng.randint(1, len(index))
        pc = rng.choice([1, 2, 4])
        bs = rng.choice([b for b in (2, 4, 8) if b % pc == 0])
        kw = dict(subset=np.arange(n), batch_size=bs, canvas=(16, 16),
                  shuffle=True, seed=rng.randint(0, 99),
                  drop_last=rng.random() < 0.5)
        ref = list(HostImageLoader(index, process_shard=(0, 1), **kw))
        parts = [list(HostImageLoader(index, process_shard=(p, pc), **kw))
                 for p in range(pc)]
        cfg_str = f"n={n} bs={bs} pc={pc} {kw['drop_last']}"
        assert all(len(p) == len(ref) for p in parts), cfg_str
        for i, rb in enumerate(ref):
            got = sorted(r for p in parts for r in _rows(p[i]))
            assert got == sorted(_rows(rb)), f"{cfg_str} batch {i}"


def test_indivisible_global_batch_raises(dataset):
    index = scan_image_folder(dataset)
    # an explicitly pinned view validates eagerly
    with pytest.raises(ValueError, match="not divisible"):
        HostImageLoader(index, batch_size=7, process_shard=(0, 2))


def test_auto_view_divisibility_is_deferred(dataset, monkeypatch):
    """The 'auto' process_count guess must not hard-fail construction: the
    trainer installs the mesh-derived view before iteration (a pure-EP mesh
    needs NO split even when process_count doesn't divide the batch)."""
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    index = scan_image_folder(dataset)
    loader = HostImageLoader(index, batch_size=6, canvas=(16, 16),
                             shuffle=False)  # 6 % 4 != 0 -> deferred
    # un-overridden iteration fails with an actionable message
    with pytest.raises(ValueError, match="set_process_view"):
        next(iter(loader))
    # the trainer-style override makes it usable
    loader.set_process_view(0, 1)
    batch = next(iter(loader))
    assert batch["image"].shape == (6, 16, 16, 3)


def test_process_input_view_and_override(dataset, mesh8):
    """Single-process: every mesh reads the whole batch (view (0, 1));
    `set_process_view` overrides a loader's auto split (the trainer pushes
    the mesh-derived view into loaders it is handed)."""
    from touhouimageclassification_tpu.parallel.mesh import (
        create_mesh, data_sharding, process_input_view,
    )

    assert process_input_view(data_sharding(mesh8)) == (0, 1)
    ep_mesh = create_mesh(num_data=2, num_expert=4)
    assert process_input_view(data_sharding(ep_mesh)) == (0, 1)

    index = scan_image_folder(dataset)
    loader = HostImageLoader(index, batch_size=4, canvas=(16, 16),
                             shuffle=False)  # auto -> (0, 1) single-process
    loader.set_process_view(1, 2)
    assert (loader._pid, loader._pcount) == (1, 2)
    assert loader._local_batch == 2
    loader.set_process_view(0, 1)
    first = next(iter(loader))
    assert first["image"].shape == (4, 16, 16, 3)  # full global batch
    assert first["mask"].all()
    with pytest.raises(ValueError, match="not divisible"):
        loader.set_process_view(0, 3)
    # an explicitly pinned view outranks the mesh-derived override
    pinned = HostImageLoader(index, batch_size=4, canvas=(16, 16),
                             shuffle=False, process_shard=(0, 1))
    pinned.set_process_view(1, 2)
    assert (pinned._pid, pinned._pcount) == (0, 1)


def test_view_from_owners_groupings():
    """The pure grouping core of process_input_view, driven with synthetic
    ownership maps (a real grouped layout needs 4+ live processes):
    disjoint slabs, shared-coordinate groups, and every rejection path."""
    from touhouimageclassification_tpu.parallel.mesh import _view_from_owners

    # plain DP: 2 processes own disjoint halves of a data axis of 4
    owners = {0: {(0,), (1,)}, 1: {(2,), (3,)}}
    assert _view_from_owners(owners, 0, [4]) == (0, 2)
    assert _view_from_owners(owners, 1, [4]) == (1, 2)
    # pure EP: both processes cover the single data coordinate -> one group
    owners = {0: {(0,)}, 1: {(0,)}}
    assert _view_from_owners(owners, 1, [1]) == (0, 1)
    # grouped 4-process (data=2, expert=2): pairs share each coordinate
    owners = {0: {(0,)}, 1: {(0,)}, 2: {(1,)}, 3: {(1,)}}
    for p in (0, 1):
        assert _view_from_owners(owners, p, [2]) == (0, 2)
    for p in (2, 3):
        assert _view_from_owners(owners, p, [2]) == (1, 2)
    # tuple axes: (data, expert) both shard dim0; rank order is row-major
    owners = {0: {(0, 0), (0, 1)}, 1: {(1, 0), (1, 1)}}
    assert _view_from_owners(owners, 1, [2, 2]) == (1, 2)
    # interleaved ownership is rejected (documented contiguous-slab contract)
    owners = {0: {(0,), (2,)}, 1: {(1,), (3,)}}
    with pytest.raises(ValueError, match="contiguous"):
        _view_from_owners(owners, 0, [4])
    # unequal group sizes are rejected
    owners = {0: {(0,), (1,), (2,)}, 1: {(3,)}}
    with pytest.raises(ValueError, match="equal"):
        _view_from_owners(owners, 0, [4])
    # overlapping-but-not-identical coverage is rejected
    owners = {0: {(0,), (1,)}, 1: {(1,), (2,)}, 2: {(3,), (0,)}}
    with pytest.raises(ValueError):
        _view_from_owners(owners, 0, [4])
    # a process with no devices in the mesh cannot feed input
    with pytest.raises(ValueError, match="owns no devices"):
        _view_from_owners({0: {(0,)}}, 1, [1])


def test_put_global_single_process_matches_device_put(mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from touhouimageclassification_tpu.parallel.mesh import (
        _global_shape, data_sharding, put_global,
    )

    tree = {"a": np.arange(32.0).reshape(16, 2),
            "b": np.ones((16,), np.int32)}
    sh = data_sharding(mesh8)
    out = put_global(tree, sh)
    assert out["a"].shape == (16, 2)
    np.testing.assert_array_equal(np.asarray(out["a"]), tree["a"])
    np.testing.assert_array_equal(np.asarray(out["b"]), tree["b"])
    # single process covers every 'data' coordinate -> local shape IS global
    assert _global_shape((16, 2), sh) == (16, 2)
    assert _global_shape((4, 16), NamedSharding(mesh8, P(None, "data"))) == (4, 16)
    assert _global_shape((16,), NamedSharding(mesh8, P())) == (16,)
