"""Multi-host DCN initialization, exercised for real.

SURVEY §5 comm-backend obligation: ``parallel/dist.py`` wraps
``jax.distributed.initialize``; this test runs TWO actual processes (each one
CPU device) through it — coordinator handshake, global 2-device mesh across
processes, and a cross-process reduction over a process-spanning global
array — so the multi-host story is tested code, not an untested wrapper.
"""
import os
import socket
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
from touhouimageclassification_tpu.parallel.dist import initialize_distributed

pid, port = int(sys.argv[1]), sys.argv[2]
assert initialize_distributed(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()

import numpy as np, jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = jax.devices()
assert len(devs) == 2, devs  # one local + one remote CPU device
mesh = Mesh(np.array(devs), ("data",))
local = np.full((1, 4), float(pid + 1), np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (2, 4))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
assert float(total) == 12.0, float(total)  # (1+2)*4 -> cross-process reduce
print(f"multihost ok {pid}", flush=True)
"""


_CHILD_PIPELINE = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
from touhouimageclassification_tpu.parallel.dist import initialize_distributed

pid, port, root, data = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
assert initialize_distributed(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2

import numpy as np, jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from touhouimageclassification_tpu.data.folder import scan_image_folder
from touhouimageclassification_tpu.data.loader import (
    HostImageLoader, device_put_iterator)
from touhouimageclassification_tpu.parallel.mesh import data_sharding, put_global

mesh = Mesh(np.array(jax.devices()), ("data",))
sh = data_sharding(mesh)

# replicated leaf: every process holds the full value, global == local shape
rep = put_global(np.arange(6.0).reshape(2, 3), NamedSharding(mesh, P()))
assert rep.shape == (2, 3)
assert float(jax.jit(jnp.sum)(rep)) == 15.0

index = scan_image_folder(data)
kw = dict(batch_size=4, canvas=(16, 16), shuffle=True, seed=7, drop_last=True)
ref = HostImageLoader(index, process_shard=(0, 1), **kw)   # global view
loader = HostImageLoader(index, **kw)                      # auto -> (pid, 2)
assert loader._pid == pid and loader._pcount == 2
assert loader._local_batch == 2

stats = jax.jit(
    lambda b: (jnp.sum(b["label"]), jnp.sum(b["image"].astype(jnp.float32))),
    out_shardings=NamedSharding(mesh, P()),
)
got = []
for batch in device_put_iterator(iter(loader), sh):
    assert batch["image"].shape == (4, 16, 16, 3), batch["image"].shape
    ls, isum = stats(batch)
    got.append((int(ls), float(isum)))
want = [(int(b["label"].sum()), float(b["image"].astype(np.float32).sum()))
        for b in ref]
assert len(got) == len(want) > 1
assert got == want, (got[:2], want[:2])
print(f"pipeline ok {pid}", flush=True)
"""


_CHILD_FIT = r"""
import dataclasses, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
from touhouimageclassification_tpu.parallel.dist import initialize_distributed

pid, port, root, data, work, mode = (int(sys.argv[1]), sys.argv[2],
                                     sys.argv[3], sys.argv[4], sys.argv[5],
                                     sys.argv[6])
nprocs = int(sys.argv[7]) if len(sys.argv) > 7 else 2
assert initialize_distributed(f"localhost:{port}", nprocs, pid)

import numpy as np
from touhouimageclassification_tpu.config import (
    AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig, TrainConfig,
    ViTConfig)
from touhouimageclassification_tpu.data.folder import (
    scan_image_folder, random_split)
from touhouimageclassification_tpu.data.loader import HostImageLoader
from touhouimageclassification_tpu.models import ViT
from touhouimageclassification_tpu.train.trainer import Trainer

cfg = TrainConfig(
    train_id="mh_run", model_type="vit-base", global_batch_size=8,
    max_epochs=2, seed=0,
    optimizer=OptimizerConfig(name="adamw", learning_rate=3e-3,
                              weight_decay=0.0),
    augment=AugmentConfig(enable_augmentation=False),
    mix=MixConfig(enable_mixup=False),
    checkpoint=CheckpointConfig(directory=os.path.join(work, "ckpt"),
                                monitor="val_acc", async_save=False),
    log_dir=os.path.join(work, "log"),
    early_stop_patience=0,
)
tiny = ViTConfig(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                 num_heads=2, mlp_dim=64, num_classes=3)
index = scan_image_folder(data)
tr, va = random_split(len(index), 0.75, seed=0)
train = HostImageLoader(index, tr, batch_size=8, canvas=(32, 32),
                        shuffle=True, seed=0, drop_last=True)
val = HostImageLoader(index, va, batch_size=8, canvas=(32, 32),
                      drop_last=False)
assert train._pcount == nprocs and train._local_batch == 8 // nprocs

if mode == "fit":
    trainer = Trainer(cfg, model=ViT(tiny))
    history = trainer.fit(train, val, resume=False)
    assert len(history) == 2, history
    assert all(np.isfinite(r["train_loss"]) for r in history)
    # multi-process resume: Orbax restores sharded jax.Arrays cooperatively
    trainer2 = Trainer(dataclasses.replace(cfg, max_epochs=3),
                       model=ViT(tiny))
    h2 = trainer2.fit(train, val, resume=True)
    assert [r["epoch"] for r in h2] == [3], h2
    print(f"fit ok {pid} loss={history[-1]['train_loss']:.6f} "
          f"val={history[-1]['val_acc']:.4f}", flush=True)
elif mode == "ep":
    # pure-EP mesh (data=1, expert=2) across 2 hosts: the batch is
    # REPLICATED across processes, so process_input_view must tell every
    # host to load ALL of it, and the expert stacks are process-spanning
    # sharded arrays that must checkpoint/restore cooperatively.
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from touhouimageclassification_tpu.config import MeshConfig, MoEConfig
    from touhouimageclassification_tpu.models.resmoe import MoEClassifier
    from touhouimageclassification_tpu.parallel.mesh import (
        create_mesh, data_sharding as dsh, process_input_view)
    from touhouimageclassification_tpu.parallel.sharding import shard_state
    from touhouimageclassification_tpu.train.checkpoint import (
        CheckpointManager)
    from touhouimageclassification_tpu.train.tasks import MoETask

    mesh_ep = create_mesh(num_data=1, num_expert=2)
    assert process_input_view(dsh(mesh_ep)) == (0, 1)
    moe = MoEConfig(num_experts=2, top_k=1, num_classes=3, routing="sparse",
                    capacity_factor=2.0, expert_vit=tiny)
    cfg_ep = dataclasses.replace(cfg, train_id="mh_ep", model_type="vit-moe",
                                 mesh=MeshConfig(num_expert_shards=2),
                                 max_epochs=1)

    def make():
        return Trainer(cfg_ep, model=MoEClassifier(moe), task=MoETask(moe),
                       mesh=mesh_ep)

    tr = make()
    h = tr.fit(train, val, resume=False)
    assert len(h) == 1 and np.isfinite(h[0]["train_loss"]), h
    # trainer overrode the loader's process_count auto-split: full batches
    assert (train._pid, train._pcount) == (0, 1)
    leaf = jax.tree_util.tree_leaves(tr.state.params["experts"])[0]
    assert "expert" in str(leaf.sharding.spec)
    assert not leaf.is_fully_addressable  # spans both hosts

    sum_fn = jax.jit(
        lambda p: sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(p)),
        out_shardings=NamedSharding(mesh_ep, P()))
    s1 = float(sum_fn(tr.state.params["experts"]))
    # cooperative restore: each host reads back only its expert shards
    tr2 = make()
    st2 = tr2.init_state(4)
    mgr = CheckpointManager(cfg_ep.checkpoint, "mh_ep")
    restored = shard_state(mgr.restore(st2), mesh_ep)
    mgr.close()
    s2 = float(sum_fn(restored.params["experts"]))
    assert s2 == s1, (s1, s2)
    print(f"ep ok {pid} sum={s1!r}", flush=True)
elif mode == "dp_ep":
    # (data=2, expert=2) mesh over 4 single-device hosts: each data
    # coordinate's devices live on TWO processes, so process_input_view
    # groups them — hosts {0,1} load IDENTICAL first half-batches and
    # hosts {2,3} the second half (count=2, not process_count=4) — while
    # the expert axis shards the expert stacks across the pairs.
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from touhouimageclassification_tpu.config import MeshConfig, MoEConfig
    from touhouimageclassification_tpu.models.resmoe import MoEClassifier
    from touhouimageclassification_tpu.parallel.mesh import (
        create_mesh, data_sharding as dsh, process_input_view)
    from touhouimageclassification_tpu.train.tasks import MoETask

    mesh4 = create_mesh(num_data=2, num_expert=2)
    assert process_input_view(dsh(mesh4)) == (pid // 2, 2), (
        pid, process_input_view(dsh(mesh4)))
    moe = MoEConfig(num_experts=2, top_k=1, num_classes=3, routing="sparse",
                    capacity_factor=2.0, expert_vit=tiny)
    cfg4 = dataclasses.replace(cfg, train_id="mh_dpep", model_type="vit-moe",
                               mesh=MeshConfig(num_expert_shards=2),
                               max_epochs=1)
    tr4 = Trainer(cfg4, model=MoEClassifier(moe), task=MoETask(moe),
                  mesh=mesh4)
    h = tr4.fit(train, val, resume=False)
    assert len(h) == 1 and np.isfinite(h[0]["train_loss"]), h
    assert (train._pid, train._pcount) == (pid // 2, 2)
    leaf = jax.tree_util.tree_leaves(tr4.state.params["experts"])[0]
    assert "expert" in str(leaf.sharding.spec)
    print(f"dp_ep ok {pid} loss={h[0]['train_loss']:.6f}", flush=True)
else:  # mode == "preempt": SIGTERM lands ONLY on process 1
    import signal

    class KillDuring:
        def __init__(self, loader, n):
            self.loader, self.n, self.fired = loader, n, False
        def steps_per_epoch(self):
            return self.loader.steps_per_epoch()
        def set_epoch(self, *args):
            self.loader.set_epoch(*args)
        def __iter__(self):
            for i, b in enumerate(iter(self.loader)):
                if pid == 1 and not self.fired and i == self.n:
                    self.fired = True
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b

    assert train.steps_per_epoch() >= 4, train.steps_per_epoch()
    trainer = Trainer(cfg, model=ViT(tiny))
    h1 = trainer.fit(KillDuring(train, 3), val, resume=False)
    assert h1 == [], h1  # BOTH processes stopped before the epoch completed
    from touhouimageclassification_tpu.train.checkpoint import (
        CheckpointManager)
    mgr = CheckpointManager(cfg.checkpoint, cfg.train_id)
    assert mgr.latest_epoch() is None, mgr.latest_epoch()  # mid-epoch save
    mgr.close()
    # resume finishes epoch 1 from the exact step, then runs epoch 2;
    # the mid-epoch restore is a cooperative multi-process Orbax load
    trainer2 = Trainer(cfg, model=ViT(tiny))
    h2 = trainer2.fit(train, val, resume=True)
    assert [r["epoch"] for r in h2] == [1, 2], h2
    assert int(trainer2.state.step) == 2 * train.steps_per_epoch()
    if pid == 0:  # the resume was MID-epoch, not a silent epoch restart
        import json as _json
        with open(os.path.join(cfg.log_dir, "mh_run", "metrics.jsonl")) as f:
            recs = [_json.loads(l) for l in f]
        assert any(r.get("resumed_mid_epoch") == 1 for r in recs), recs
    # third fit: the full-epoch saves now outrank the stale partial, so the
    # cooperative multi-process purge path runs (Orbax delete from every
    # process) — must not deadlock and must empty the partial dir
    trainer3 = Trainer(cfg, model=ViT(tiny))
    h3 = trainer3.fit(train, val, resume=True)
    assert h3 == [], h3  # max_epochs already reached
    pdir = os.path.join(cfg.checkpoint.directory, "mh_run_partial")
    assert not any(d.isdigit() for d in os.listdir(pdir)), os.listdir(pdir)
    print(f"preempt ok {pid}", flush=True)
"""


_CHILD_ELASTIC = r"""
import dataclasses, json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")

pid, port, root, data, work, mode, nprocs = (
    int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5],
    sys.argv[6], int(sys.argv[7]))
if nprocs > 1:
    from touhouimageclassification_tpu.parallel.dist import (
        initialize_distributed)
    assert initialize_distributed(f"localhost:{port}", nprocs, pid)

import numpy as np
from touhouimageclassification_tpu.config import (
    AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig, TrainConfig,
    ViTConfig)
from touhouimageclassification_tpu.data.folder import (
    scan_image_folder, random_split)
from touhouimageclassification_tpu.data.loader import HostImageLoader
from touhouimageclassification_tpu.models import ViT
from touhouimageclassification_tpu.train.trainer import Trainer

epochs = 3 if mode in ("resume3", "scratch3") else 2
cfg = TrainConfig(
    train_id="mh_elastic", model_type="vit-base", global_batch_size=8,
    max_epochs=epochs, seed=0,
    optimizer=OptimizerConfig(name="adamw", learning_rate=3e-3,
                              weight_decay=0.0),
    augment=AugmentConfig(enable_augmentation=False),
    mix=MixConfig(enable_mixup=False),
    checkpoint=CheckpointConfig(directory=os.path.join(work, "ckpt"),
                                monitor="val_acc", async_save=False),
    log_dir=os.path.join(work, "log"),
    early_stop_patience=0,
)
tiny = ViTConfig(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                 num_heads=2, mlp_dim=64, num_classes=3)
index = scan_image_folder(data)
tr, va = random_split(len(index), 0.75, seed=0)
train = HostImageLoader(index, tr, batch_size=8, canvas=(32, 32),
                        shuffle=True, seed=0, drop_last=True)
val = HostImageLoader(index, va, batch_size=8, canvas=(32, 32),
                      drop_last=False)

if mode == "preempt2":
    # SIGTERM lands on process 1 only, mid-epoch: both hosts agree, save
    # one cooperative partial checkpoint, and stop before the epoch ends
    import signal

    class KillDuring:
        def __init__(self, loader, n):
            self.loader, self.n, self.fired = loader, n, False
        def steps_per_epoch(self):
            return self.loader.steps_per_epoch()
        def set_epoch(self, *args):
            self.loader.set_epoch(*args)
        def __iter__(self):
            for i, b in enumerate(iter(self.loader)):
                if pid == 1 and not self.fired and i == self.n:
                    self.fired = True
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b

    assert train.steps_per_epoch() >= 4
    trainer = Trainer(cfg, model=ViT(tiny))
    history = trainer.fit(KillDuring(train, 2), val, resume=False)
    assert history == [], history
else:
    trainer = Trainer(cfg, model=ViT(tiny))
    history = trainer.fit(train, val,
                          resume=(mode in ("resume3", "presume2")))
if mode == "presume2":
    # the resume engaged MID-epoch (exact-step), not an epoch restart
    with open(os.path.join(cfg.log_dir, "mh_elastic", "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert any(r.get("resumed_mid_epoch") == 1 for r in recs), recs
print("ELASTIC " + json.dumps(
    {"mode": mode, "pid": pid,
     "hist": [[r["epoch"], float(r["train_loss"])] for r in history]}),
    flush=True)
print(f"{mode} ok {pid}", flush=True)
"""


_CHILD_EP_RESUME = r"""
import dataclasses, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
# NO distributed init: one process, one device — the elastic restore case

root, data, work = sys.argv[3], sys.argv[4], sys.argv[5]

import jax.numpy as jnp
import numpy as np
from touhouimageclassification_tpu.config import (
    AugmentConfig, CheckpointConfig, MeshConfig, MixConfig, MoEConfig,
    OptimizerConfig, TrainConfig, ViTConfig)
from touhouimageclassification_tpu.models.resmoe import MoEClassifier
from touhouimageclassification_tpu.train.checkpoint import CheckpointManager
from touhouimageclassification_tpu.train.tasks import MoETask
from touhouimageclassification_tpu.train.trainer import Trainer

tiny = ViTConfig(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                 num_heads=2, mlp_dim=64, num_classes=3)
moe = MoEConfig(num_experts=2, top_k=1, num_classes=3, routing="sparse",
                capacity_factor=2.0, expert_vit=tiny)
cfg = TrainConfig(
    train_id="mh_ep", model_type="vit-moe", global_batch_size=8,
    max_epochs=1, seed=0,
    optimizer=OptimizerConfig(name="adamw", learning_rate=3e-3,
                              weight_decay=0.0),
    augment=AugmentConfig(enable_augmentation=False),
    mix=MixConfig(enable_mixup=False),
    checkpoint=CheckpointConfig(directory=os.path.join(work, "ckpt"),
                                monitor="val_acc", async_save=False),
    log_dir=os.path.join(work, "log"),
    mesh=MeshConfig(num_expert_shards=1),  # single device: no EP axis
)
trainer = Trainer(cfg, model=MoEClassifier(moe), task=MoETask(moe))
state = trainer.init_state(4)
mgr = CheckpointManager(cfg.checkpoint, "mh_ep")
# the checkpoint was written COOPERATIVELY by two processes, each saving
# only the expert shards its device owned; Orbax reshards on restore into
# this process's single-device (fully addressable) template
restored = mgr.restore(state)
mgr.close()
leaf = jax.tree_util.tree_leaves(restored.params["experts"])[0]
assert leaf.is_fully_addressable
s = float(sum(jnp.sum(x) for x in
              jax.tree_util.tree_leaves(restored.params["experts"])))
print(f"EPSUM {s!r}", flush=True)
print("ep_resume ok", flush=True)
"""


_CHILD_CLI = r"""
import os, sys
pid, port, root, data, work = (int(sys.argv[1]), sys.argv[2], sys.argv[3],
                               sys.argv[4], sys.argv[5])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ["TIC_CHECKPOINT_DIR"] = os.path.join(work, "ckpt")
os.environ["TIC_LOG_DIR"] = os.path.join(work, "log")
sys.path.insert(0, root)
import jax
jax.config.update("jax_platforms", "cpu")

# the REAL user-facing launch: the same ntrain command on every host, with
# multi-host wired purely through the standard CLI flags
from touhouimageclassification_tpu.train.ntrain import main

main(["--preset", "nvit", "--tiny", "--no-pretrained", "--data-dir", data,
      "--max-epochs", "1", "--batch-size", "8",
      "--coordinator", f"localhost:{port}", "--num-processes", "2",
      "--process-id", str(pid)])
assert jax.process_count() == 2
print(f"cli ok {pid}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_initialize_and_reduce():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(pid), str(port), _ROOT],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host children timed out")
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {pid} failed:\n{out}\n{err}"
        assert f"multihost ok {pid}" in out


def test_two_process_sharded_input_pipeline(tmp_path):
    """Each host decodes only its half of every global batch; ``put_global``
    assembles the process-spanning array, and the device-side contents of
    every step equal the single-process loader's batches exactly."""
    from fixtures import make_image_folder

    data = make_image_folder(str(tmp_path / "data"), num_classes=3,
                             per_class=7, size=16)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD_PIPELINE, str(pid), str(port),
             _ROOT, data],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("pipeline children timed out")
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {pid} failed:\n{out}\n{err}"
        assert f"pipeline ok {pid}" in out


def _run_fit_children(tmp_path, mode, timeout=700, nprocs=2):
    # timeout sized for the ONE-core box: two JAX-CPU children time-slice
    # the core with the pytest parent, and mid-suite page-cache pressure
    # adds minutes (the EP test hit 420 s in a full-suite run while
    # passing comfortably in isolation)
    from fixtures import make_image_folder

    data = make_image_folder(str(tmp_path / "data"), num_classes=3,
                             per_class=15, size=32)
    work = str(tmp_path / "work")
    os.makedirs(work, exist_ok=True)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD_FIT, str(pid), str(port), _ROOT,
             data, work, mode, str(nprocs)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"{mode} children timed out")
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {pid} failed:\n{out}\n{err}"
        assert f"{mode} ok {pid}" in out
    return outs, work


def test_two_process_ntrain_cli(tmp_path):
    """The user-facing multi-host launch: the SAME `ntrain` command on both
    hosts, distributed init wired purely through the --coordinator/
    --num-processes/--process-id CLI flags (MULTIHOST.md's recipe)."""
    from fixtures import make_image_folder

    data = make_image_folder(str(tmp_path / "data"), num_classes=3,
                             per_class=15, size=32)
    work = str(tmp_path / "work")
    os.makedirs(work, exist_ok=True)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD_CLI, str(pid), str(port), _ROOT,
             data, work],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("cli children timed out")
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {pid} failed:\n{out}\n{err}"
        assert f"cli ok {pid}" in out


def test_two_process_trainer_fit_and_resume(tmp_path):
    """Full Trainer.fit across two real processes: process-sharded input,
    SPMD step over a process-spanning mesh, cooperative Orbax save/restore
    (each process writes only its addressable shards), single-writer
    metrics. The replicated loss must be bit-identical on both hosts."""
    import json
    import re

    outs, work = _run_fit_children(tmp_path, "fit")
    losses = {re.search(r"loss=(\S+)", out).group(1) for _, out, _ in outs}
    assert len(losses) == 1, f"hosts disagree on the replicated loss: {losses}"
    # exactly one process wrote metrics.jsonl: 2 epochs + 1 resumed epoch
    with open(os.path.join(work, "log", "mh_run", "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert [r["epoch"] for r in records] == [1, 2, 3]


def test_two_process_preemption_agreement(tmp_path):
    """SIGTERM lands on ONE host only; the per-step agreement collective
    makes BOTH processes break at the same step (a lone leaver would
    deadlock the survivor's next all-reduce), save one cooperative partial
    checkpoint, and both resume past it."""
    _run_fit_children(tmp_path, "preempt")


@pytest.mark.skipif(
    os.environ.get("TIC_RUN_MH4") != "1",
    reason="4 JAX processes exceed this box's single CPU core: processes "
           "stagger past Gloo's hard 30s context-init timeout (flaky). "
           "Opt in with TIC_RUN_MH4=1 on a multi-core machine.",
)
def test_four_process_dp_ep_fit(tmp_path):
    """(data=2, expert=2) over 4 single-device hosts — the GROUPED input
    case: each data coordinate spans two processes, so process_input_view
    tells host pairs {0,1} and {2,3} to load identical half-batches
    (count=2, not process_count=4) while experts shard across the pairs.
    The replicated loss must agree across all four hosts."""
    import re

    outs, _ = _run_fit_children(tmp_path, "dp_ep", timeout=600, nprocs=4)
    losses = {re.search(r"loss=(\S+)", out).group(1) for _, out, _ in outs}
    assert len(losses) == 1, f"hosts disagree: {losses}"


def test_two_process_expert_parallel_fit_and_checkpoint(tmp_path):
    """Pure-EP mesh across two hosts: the batch is replicated across
    processes (process_input_view overrides the loader's process_count
    split so both hosts load full batches), the expert stacks train as
    process-spanning sharded arrays, and checkpointing them is cooperative
    — each host writes/reads only its expert shards.

    Elastic follow-up: a SINGLE process (no distributed init) restores the
    two-host checkpoint — Orbax reshards the process-spanning expert
    stacks into the one-device template — and the expert parameter sum
    matches the value the 2-host cluster computed."""
    import re

    outs, work = _run_fit_children(tmp_path, "ep")
    s1 = float(re.search(r"sum=(\S+)", outs[0][1]).group(1))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    p = subprocess.run(
        [sys.executable, "-c", _CHILD_EP_RESUME, "0", "0", _ROOT, "-", work],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert p.returncode == 0, f"{p.stdout}\n{p.stderr}"
    assert "ep_resume ok" in p.stdout
    s = float(re.search(r"EPSUM (\S+)", p.stdout).group(1))
    # same f32 values; only the summation order differs (2-device psum vs
    # one-device reduce)
    import numpy as np

    assert np.isclose(s, s1, rtol=1e-5), (s, s1)


def _run_elastic_child(data, work, mode, nprocs, port=0):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD_ELASTIC, str(pid), str(port),
             _ROOT, data, work, mode, str(nprocs)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=700)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"elastic {mode} children timed out")
        outs.append((p.returncode, out, err))
    import json as _json

    hists = []
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"elastic {mode} process {pid} failed:\n{out}\n{err}"
        assert f"{mode} ok {pid}" in out
        line = next(l for l in out.splitlines() if l.startswith("ELASTIC "))
        hists.append(_json.loads(line[len("ELASTIC "):])["hist"])
    return hists


def test_elastic_resume_across_process_counts(tmp_path):
    """Checkpoints are topology-portable: a run trained on TWO processes
    resumes on ONE (scale-down after losing a host) and a single-process
    run resumes on TWO (scale-up), in both cases continuing at the right
    epoch with the restored parameters — the loader split and state
    shardings re-derive from the CURRENT mesh, and Orbax reshards saved
    arrays into the new template. Verified against a single-process
    control: the resumed epoch-3 loss must match the control's epoch-3
    loss, not its epoch-1 loss (a silent restart)."""
    import numpy as np
    from fixtures import make_image_folder

    data = make_image_folder(str(tmp_path / "data"), num_classes=3,
                             per_class=15, size=32)

    work_ctl = str(tmp_path / "ctl")
    (ctl,) = _run_elastic_child(data, work_ctl, "scratch3", nprocs=1)
    assert [e for e, _ in ctl] == [1, 2, 3]
    e1, e3 = ctl[0][1], ctl[2][1]
    assert abs(e1 - e3) > 1e-3, f"control never learned: {ctl}"

    # scale DOWN: 2-process training, 1-process resume
    work_a = str(tmp_path / "a")
    hists = _run_elastic_child(data, work_a, "train2", nprocs=2,
                               port=_free_port())
    for h in hists:  # 2-proc losses track the 1-proc control per epoch
        assert [e for e, _ in h] == [1, 2]
        np.testing.assert_allclose([l for _, l in h],
                                   [l for _, l in ctl[:2]], rtol=2e-2)
    (resumed,) = _run_elastic_child(data, work_a, "resume3", nprocs=1)
    assert [e for e, _ in resumed] == [3], resumed
    r3 = resumed[0][1]
    assert abs(r3 - e3) < 0.25 * abs(e1 - e3), (r3, ctl)

    # scale UP: 1-process training, 2-process resume
    work_b = str(tmp_path / "b")
    _run_elastic_child(data, work_b, "train2", nprocs=1)
    hists = _run_elastic_child(data, work_b, "resume3", nprocs=2,
                               port=_free_port())
    for h in hists:
        assert [e for e, _ in h] == [3], h
        assert abs(h[0][1] - e3) < 0.25 * abs(e1 - e3), (h, ctl)


def test_elastic_resume_after_mid_epoch_preemption(tmp_path):
    """The realest elasticity case: a 2-process run is SIGTERM-preempted
    MID-epoch (cooperative partial checkpoint at the exact optimizer step),
    then resumed by ONE process — it must finish epoch 1 from that step
    (metrics record `resumed_mid_epoch`), continue through epoch 2, and
    land at the control's epoch-2 loss, not a restart's epoch-1 loss."""
    import numpy as np
    from fixtures import make_image_folder

    data = make_image_folder(str(tmp_path / "data"), num_classes=3,
                             per_class=15, size=32)
    work_ctl = str(tmp_path / "ctl")
    (ctl,) = _run_elastic_child(data, work_ctl, "train2", nprocs=1)
    assert [e for e, _ in ctl] == [1, 2]
    e1, e2 = ctl[0][1], ctl[1][1]
    assert abs(e1 - e2) > 1e-3, f"control never learned: {ctl}"

    work_p = str(tmp_path / "p")
    hists = _run_elastic_child(data, work_p, "preempt2", nprocs=2,
                               port=_free_port())
    assert hists == [[], []], hists  # both stopped before the epoch closed
    (resumed,) = _run_elastic_child(data, work_p, "presume2", nprocs=1)
    assert [e for e, _ in resumed] == [1, 2], resumed
    # the resumed epoch-1 mean covers only the post-resume steps (the
    # preempted process's earlier step losses died with it), so compare
    # the first FULL epoch: epoch 2 must land at the control's epoch-2
    # loss, far from its epoch-1 loss (which a silent restart would show)
    np.testing.assert_allclose(resumed[1][1], e2, rtol=2e-2)
    assert abs(resumed[1][1] - e2) < 0.25 * abs(e1 - e2), (resumed, ctl)
