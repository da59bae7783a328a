"""End-to-end: data -> augment -> DP train step over an 8-device mesh ->
checkpoint -> resume -> eval. The 'minimum end-to-end slice' of SURVEY §7."""
import dataclasses
import os

import jax
import numpy as np
import pytest

from touhouimageclassification_tpu.config import (
    AugmentConfig, CheckpointConfig, MixConfig, OptimizerConfig, TrainConfig,
)
from touhouimageclassification_tpu.data.folder import scan_image_folder, random_split
from touhouimageclassification_tpu.data.loader import HostImageLoader
from touhouimageclassification_tpu.models import ViT
from touhouimageclassification_tpu.models.resnet import resnet
from touhouimageclassification_tpu.config import ViTConfig
from touhouimageclassification_tpu.train.trainer import Trainer

from fixtures import make_image_folder

N_CLASSES = 4


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return make_image_folder(str(root), num_classes=N_CLASSES, per_class=16, size=48)


def _cfg(tmp_path, **over):
    defaults = dict(
        train_id="test_run",
        model_type="vit-base",
        global_batch_size=8,
        max_epochs=2,
        seed=0,
        optimizer=OptimizerConfig(name="adamw", learning_rate=3e-3, weight_decay=0.0),
        augment=AugmentConfig(),
        mix=MixConfig(enable_mixup=False),
        checkpoint=CheckpointConfig(
            directory=str(tmp_path / "ckpt"), top_k=2, monitor="val_acc",
            every_n_epochs=1, async_save=False,
        ),
        log_dir=str(tmp_path / "log"),
        early_stop_patience=0,
    )
    defaults.update(over)
    return TrainConfig(**defaults)


def _loaders(dataset, batch=8, canvas=(48, 48)):
    index = scan_image_folder(dataset)
    tr, va = random_split(len(index), 0.75, seed=0)
    train = HostImageLoader(index, tr, batch_size=batch, canvas=canvas, shuffle=True,
                            seed=0, drop_last=True)
    val = HostImageLoader(index, va, batch_size=batch, canvas=canvas, shuffle=False,
                          drop_last=False)
    return train, val


TINY = ViTConfig(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                 num_heads=2, mlp_dim=64, num_classes=N_CLASSES)


def test_vit_trains_and_learns(dataset, tmp_path):
    cfg = _cfg(tmp_path, max_epochs=4)
    model = ViT(TINY)
    trainer = Trainer(cfg, model=model)
    train, val = _loaders(dataset)
    history = trainer.fit(train, val, resume=False)
    assert len(history) == 4
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    # solid-color classes should be learnable well above chance (0.25)
    assert history[-1]["val_acc"] > 0.4
    assert os.path.exists(os.path.join(cfg.log_dir, "test_run", "metrics.jsonl"))


def test_checkpoint_resume(dataset, tmp_path):
    cfg = _cfg(tmp_path, max_epochs=2)
    model = ViT(TINY)

    def make_trainer():
        return Trainer(cfg, model=model)

    train, val = _loaders(dataset)
    t1 = make_trainer()
    h1 = t1.fit(train, val, resume=False)
    assert len(h1) == 2
    step_after = int(t1.state.step)

    # resume: latest epoch == max_epochs -> no more training, state restored
    cfg3 = dataclasses.replace(cfg, max_epochs=3)
    t2 = make_trainer()
    t2.cfg = cfg3
    h2 = t2.fit(train, val, resume=True)
    assert len(h2) == 1          # only epoch 3 runs
    assert int(t2.state.step) > step_after


def test_resnet_trains_with_batchstats(dataset, tmp_path):
    cfg = _cfg(tmp_path, model_type="resnet18",
               optimizer=OptimizerConfig(name="sgd", learning_rate=1e-2, schedule="step"),
               augment=AugmentConfig(enable_augmentation=False), max_epochs=1)
    model = resnet(18, num_classes=N_CLASSES, image_size=32)
    trainer = Trainer(cfg, model=model)
    train, val = _loaders(dataset)
    history = trainer.fit(train, val, resume=False)
    assert np.isfinite(history[0]["train_loss"])
    # batch_stats must have been threaded through the step
    stats = jax.tree_util.tree_leaves(trainer.state.model_state["batch_stats"])
    assert any(np.abs(np.asarray(s)).sum() > 0 for s in stats)


def test_resnet_stale_bn_trains_via_trainer(dataset, tmp_path):
    """bn_variant='stale' (the +18.6%-on-chip opt-in, tools/bench_bn.py)
    through the REAL Trainer: model_state threading, jit, and the EMA
    update all compose — the integration the pure-numerics test in
    test_models.py doesn't cover."""
    cfg = _cfg(tmp_path, model_type="resnet18",
               optimizer=OptimizerConfig(name="sgd", learning_rate=1e-2, schedule="step"),
               augment=AugmentConfig(enable_augmentation=False), max_epochs=1)
    model = resnet(18, num_classes=N_CLASSES, image_size=32, bn_variant="stale")
    trainer = Trainer(cfg, model=model)
    train, val = _loaders(dataset)
    history = trainer.fit(train, val, resume=False)
    assert np.isfinite(history[0]["train_loss"])
    # running MEANS init to zero; nonzero after a step proves the EMA
    # update ran inside the train step (var leaves init to one — no signal)
    flat = jax.tree_util.tree_flatten_with_path(
        trainer.state.model_state["batch_stats"])[0]
    means = [np.asarray(v) for path, v in flat
             if any(getattr(k, "key", "") == "mean" for k in path)]
    assert means and any(np.abs(m).sum() > 0 for m in means)


def test_mixup_path_in_trainer(dataset, tmp_path):
    cfg = _cfg(tmp_path, mix=MixConfig(enable_mixup=True), max_epochs=1)
    model = ViT(TINY)
    trainer = Trainer(cfg, model=model)
    train, val = _loaders(dataset)
    history = trainer.fit(train, val, resume=False)
    assert np.isfinite(history[0]["train_loss"])


def test_window_early_exit_matches_reference_rule():
    """window_early_exit reproduces TIC/ViT/finetune.py:79-91 exactly:
    compare against the value just before the window, ties = no improvement,
    never fire while len(timeline) < patience."""
    from touhouimageclassification_tpu.train.trainer import window_early_exit

    # reference oracle, transcribed (mode='min' losses)
    def ref(timeline, n):
        if len(timeline) < n:
            return False
        w = timeline[-(n + 1):]
        return all(loss >= w[0] for loss in w[1:])

    import itertools
    import random

    rng = random.Random(0)
    for n in (1, 2, 3):
        for length in range(0, 7):
            for _ in range(30):
                tl = [round(rng.uniform(0, 1), 2) for _ in range(length)]
                assert window_early_exit(tl, n, "min") == ref(tl, n), (tl, n)
    # the comparison point slides: a dip below window-start but above the
    # global best STILL resets the window (patience-from-best would stop)
    tl = [1.0, 5.0, 4.0, 4.5, 4.6]
    assert not window_early_exit(tl, 3, "min")
    # max mode mirrors
    assert window_early_exit([0.5, 0.5, 0.4, 0.3], 3, "max")
    assert not window_early_exit([0.5, 0.5, 0.6, 0.3], 3, "max")
    # patience=0 disables
    assert not window_early_exit([3, 2, 1], 0, "min")


def test_checkpoint_retention_caps_every_n(tmp_path):
    """Union retention: top-k by metric + newest top_k of every-N epochs +
    the latest epoch — every-N keeps must NOT grow without bound
    (reference ntrain.py:230-236 keeps only the last 3 of every-3)."""
    import jax.numpy as jnp

    from touhouimageclassification_tpu.train.checkpoint import CheckpointManager

    cfg = CheckpointConfig(directory=str(tmp_path), top_k=3, monitor="val_acc",
                           mode="max", every_n_epochs=3, async_save=False)
    mgr = CheckpointManager(cfg, "run")
    accs = {1: .2, 2: .9, 3: .3, 4: .85, 5: .4, 6: .41, 7: .42, 8: .88,
            9: .1, 10: .05, 11: .06}
    state = {"w": jnp.zeros((2,))}
    for ep, acc in accs.items():
        mgr.save(ep, state, {"val_acc": acc})
    mgr.wait()
    kept = set(mgr._mgr.all_steps())
    # top-3 by val_acc = {2,4,8}; newest 3 multiples of 3 = {3,6,9}; latest=11
    assert kept == {2, 3, 4, 6, 8, 9, 11}, kept
    assert mgr.best_epoch() == 2
    assert mgr.latest_epoch() == 11
    mgr.close()


class KillAtBatch:
    """Loader wrapper delivering SIGTERM to our own process after the n-th
    batch counted ACROSS epochs (fires once)."""

    def __init__(self, loader, n):
        self.loader, self.n, self.count = loader, n, 0

    def steps_per_epoch(self):
        return self.loader.steps_per_epoch()

    def set_epoch(self, *args):
        self.loader.set_epoch(*args)

    def __iter__(self):
        import signal

        for b in iter(self.loader):
            if self.count == self.n:
                os.kill(os.getpid(), signal.SIGTERM)
            self.count += 1
            yield b


def test_sigterm_preemption_checkpoints_and_resumes(dataset, tmp_path):
    """TPU-VM preemption story: SIGTERM mid-epoch -> finish the in-flight
    step, save a mid-epoch checkpoint keyed by GLOBAL optimizer step, stop
    cleanly; a later fit() resumes at the exact step — no batch trained
    twice, none skipped — so the preempted+resumed run ends BIT-IDENTICAL
    to an uninterrupted control run. (The reference has no analogue —
    Lightning just dies and restarts the epoch.)"""
    import json
    import signal

    cfg = _cfg(tmp_path, max_epochs=3)
    model = ViT(TINY)
    train, val = _loaders(dataset)

    prev_handler = signal.getsignal(signal.SIGTERM)
    t1 = Trainer(cfg, model=model)
    h1 = t1.fit(KillAtBatch(train, 2), val, resume=False)
    assert h1 == []  # no epoch completed
    assert signal.getsignal(signal.SIGTERM) is prev_handler  # restored

    from touhouimageclassification_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(cfg.checkpoint, cfg.train_id)
    assert mgr.latest_epoch() is None  # no FULL epoch was checkpointed
    mgr.close()
    with open(os.path.join(cfg.log_dir, "test_run", "metrics.jsonl")) as f:
        last = json.loads(f.readlines()[-1])
    assert last["preempted"] is True
    assert 1 <= last["steps"] < train.steps_per_epoch()
    steps_done = last["steps"]

    # resume finishes epoch 1 from the exact batch, then runs epochs 2-3
    t2 = Trainer(cfg, model=model)
    h2 = t2.fit(train, val, resume=True)
    assert [r["epoch"] for r in h2] == [1, 2, 3]
    assert int(t2.state.step) == 3 * train.steps_per_epoch()
    # the resumed first epoch trained only the REMAINING batches
    assert h2[0]["images_per_second"] > 0

    # the resume must have been MID-epoch, not a silent restart (caught a
    # real bug: Orbax drops metrics without a best_fn, so the resume meta
    # never persisted and restart-from-scratch passed every other assert)
    with open(os.path.join(cfg.log_dir, "test_run", "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    marks = [r for r in records if "resumed_mid_epoch" in r]
    assert marks and marks[-1]["resumed_mid_epoch"] == 1
    assert marks[-1]["start_batch"] == steps_done

    # control run, never preempted: same seed, same (seed, epoch)-keyed
    # data order, same step-keyed RNG -> params must match exactly
    cfg_c = _cfg(tmp_path / "control", max_epochs=3)
    os.makedirs(str(tmp_path / "control"), exist_ok=True)
    tc = Trainer(cfg_c, model=model)
    hc = tc.fit(*_loaders(dataset), resume=False)
    assert steps_done < int(t2.state.step)
    # distinguishing signal: the resumed epoch 1 averaged only the REMAINING
    # batches, so its logged loss differs from the control's full epoch 1
    assert h2[0]["train_loss"] != hc[0]["train_loss"]
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(t2.state.params)),
        jax.tree_util.tree_leaves(jax.device_get(tc.state.params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_preemption_resume_mid_accumulation_window(dataset, tmp_path):
    """Grad accumulation x exact-step resume: preempting INSIDE an
    optax.MultiSteps accumulation window must restore the half-filled
    accumulator (it lives in opt_state) and continue bit-identically."""
    import signal

    model = ViT(TINY)
    train, val = _loaders(dataset)
    opt = OptimizerConfig(name="adamw", learning_rate=3e-3, weight_decay=0.0,
                          grad_accum_steps=2)

    # steps_per_epoch=6, accum=2 -> kill after 3 micro-batches: the third
    # accumulation window is half-filled at the preemption point
    cfg = _cfg(tmp_path, max_epochs=2, optimizer=opt)
    h1 = Trainer(cfg, model=model).fit(KillAtBatch(train, 3), val, resume=False)
    assert h1 == []
    t2 = Trainer(cfg, model=model)
    h2 = t2.fit(train, val, resume=True)
    assert [r["epoch"] for r in h2] == [1, 2]

    cfg_c = _cfg(tmp_path / "control", max_epochs=2, optimizer=opt)
    tc = Trainer(cfg_c, model=model)
    hc = tc.fit(*_loaders(dataset), resume=False)
    assert h2[0]["train_loss"] != hc[0]["train_loss"]  # resumed, not restarted
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(t2.state.params)),
        jax.tree_util.tree_leaves(jax.device_get(tc.state.params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_preemption_resume_with_scan_fused_steps(dataset, tmp_path):
    """steps_per_call>1 (lax.scan-fused optimizer steps): the preemption
    offset is counted in host batches and is always a multiple of k, so the
    resumed stacked iterator regroups identically — bit-identical params."""
    import signal

    model = ViT(TINY)
    train, val = _loaders(dataset)

    cfg = _cfg(tmp_path, max_epochs=2, steps_per_call=2)
    h1 = Trainer(cfg, model=model).fit(KillAtBatch(train, 3), val, resume=False)
    assert h1 == []
    t2 = Trainer(cfg, model=model)
    h2 = t2.fit(train, val, resume=True)
    assert [r["epoch"] for r in h2] == [1, 2]

    cfg_c = _cfg(tmp_path / "control", max_epochs=2, steps_per_call=2)
    tc = Trainer(cfg_c, model=model)
    hc = tc.fit(*_loaders(dataset), resume=False)
    assert h2[0]["train_loss"] != hc[0]["train_loss"]  # resumed, not restarted
    assert int(t2.state.step) == int(tc.state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(t2.state.params)),
        jax.tree_util.tree_leaves(jax.device_get(tc.state.params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stale_partial_checkpoints_do_not_resurrect(dataset, tmp_path):
    """A mid-epoch preemption checkpoint from an ABANDONED lineage (user
    restarted with resume=False) must be purged, not restored later — and a
    fresh preemption save must not lose to a stale higher-step one under
    newest-only retention."""
    import signal

    model = ViT(TINY)
    train, val = _loaders(dataset)

    # run A: preempted mid-epoch 2 -> stale partial with epoch_index=1,
    # which OUTRANKS run B's single full epoch — the dangerous scenario:
    # without the purge, run C would restore run A's abandoned weights
    spe = train.steps_per_epoch()
    cfg = _cfg(tmp_path, max_epochs=3)
    ha = Trainer(cfg, model=model).fit(
        KillAtBatch(train, spe + 2), val, resume=False)
    assert [r["epoch"] for r in ha] == [1]  # epoch 1 completed, 2 preempted
    partial_dir = os.path.join(str(tmp_path / "ckpt"), "test_run_partial")
    assert any(d.isdigit() for d in os.listdir(partial_dir))

    # run B: fresh start (resume=False) -> stale partial purged
    cfg_b = _cfg(tmp_path, max_epochs=1)
    tb = Trainer(cfg_b, model=model)
    hb = tb.fit(train, val, resume=False)
    assert [r["epoch"] for r in hb] == [1]
    assert not any(d.isdigit() for d in os.listdir(partial_dir))

    # run C: auto-resume continues from run B's FULL epoch, not run A's
    # stale mid-epoch-2 state (epoch_index 1 >= full 1 would have matched)
    import json

    cfg_c = _cfg(tmp_path, max_epochs=2)
    tc = Trainer(cfg_c, model=model)
    hc = tc.fit(train, val, resume=True)
    assert [r["epoch"] for r in hc] == [2]
    assert int(tc.state.step) == 2 * spe
    with open(os.path.join(cfg.log_dir, "test_run", "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert not any("resumed_mid_epoch" in r for r in records), records


def test_boundary_preemption_still_writes_the_full_save(dataset, tmp_path):
    """Preemption during an epoch's very LAST step leaves a partial with
    steps_done == steps_per_epoch and no full save. Resume must not skip
    past the epoch (losing its full checkpoint forever): the resumed epoch
    yields zero batches but still runs val and writes the full save, then
    training continues bit-identically."""
    import dataclasses as dc

    from touhouimageclassification_tpu.train.checkpoint import CheckpointManager

    model = ViT(TINY)
    train, val = _loaders(dataset)
    spe = train.steps_per_epoch()

    # craft the exact on-disk state such a death leaves: end-of-epoch-1
    # weights in the partial dir, nothing in the full dir
    cfg = _cfg(tmp_path, max_epochs=1)
    t1 = Trainer(cfg, model=model)
    t1.fit(train, val, resume=False)
    end_of_epoch1 = jax.device_get(t1.state)
    partial_cfg = dc.replace(cfg.checkpoint, monitor="steps_done",
                             mode="max", top_k=1, every_n_epochs=0)
    pdir = os.path.join(str(tmp_path / "ckpt"), "test_run_partial")
    pmgr = CheckpointManager(partial_cfg, "test_run", directory=pdir)
    pmgr.save(spe, end_of_epoch1,
              {"epoch_index": 0.0, "steps_done": float(spe)})
    pmgr.wait()
    pmgr.close()
    import shutil

    shutil.rmtree(os.path.join(str(tmp_path / "ckpt"), "test_run"))

    cfg2 = _cfg(tmp_path, max_epochs=2)
    t2 = Trainer(cfg2, model=model)
    h2 = t2.fit(train, val, resume=True)
    # epoch 1 = the boundary completion (zero train steps, val + full save)
    assert [r["epoch"] for r in h2] == [1, 2]
    assert h2[0]["images_per_second"] == 0.0
    assert "val_acc" in h2[0]
    mgr = CheckpointManager(cfg2.checkpoint, "test_run")
    assert set(mgr._mgr.all_steps()) == {1, 2}  # the lost save was written
    mgr.close()
    assert int(t2.state.step) == 2 * spe

    # bit-identical to a never-interrupted 2-epoch control
    cfg_c = _cfg(tmp_path / "control", max_epochs=2)
    tc = Trainer(cfg_c, model=model)
    tc.fit(*_loaders(dataset), resume=False)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(t2.state.params)),
        jax.tree_util.tree_leaves(jax.device_get(tc.state.params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orphan_partial_from_deleted_lineage_is_ignored(dataset, tmp_path):
    """If the user deletes the run's checkpoint dir to start over (unaware of
    the `<run>_partial` sibling), a later-epoch orphan partial must NOT be
    restored by the next resume=True run — it is purged and training starts
    from scratch."""
    import json
    import shutil

    model = ViT(TINY)
    train, val = _loaders(dataset)
    spe = train.steps_per_epoch()

    cfg = _cfg(tmp_path, max_epochs=3)
    Trainer(cfg, model=model).fit(KillAtBatch(train, spe + 2), val,
                                  resume=False)
    partial_dir = os.path.join(str(tmp_path / "ckpt"), "test_run_partial")
    assert any(d.isdigit() for d in os.listdir(partial_dir))
    shutil.rmtree(os.path.join(str(tmp_path / "ckpt"), "test_run"))

    t = Trainer(cfg, model=model)
    h = t.fit(train, val, resume=True)
    assert [r["epoch"] for r in h] == [1, 2, 3]  # from scratch
    assert int(t.state.step) == 3 * spe
    assert not any(d.isdigit() for d in os.listdir(partial_dir))  # purged
    with open(os.path.join(cfg.log_dir, "test_run", "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert not any("resumed_mid_epoch" in r for r in records)


def test_loader_early_break_releases_producer(dataset):
    """Breaking out of a loader mid-epoch must not wedge the producer thread
    (review finding: q.put blocked forever on a full queue)."""
    import threading
    import time

    from touhouimageclassification_tpu.data.folder import scan_image_folder
    from touhouimageclassification_tpu.data.loader import HostImageLoader

    index = scan_image_folder(dataset)
    before = threading.active_count()
    for _ in range(5):
        loader = HostImageLoader(index, batch_size=4, canvas=(24, 24),
                                 prefetch_batches=1)
        it = iter(loader)
        next(it)
        it.close()  # early break
    time.sleep(1.0)  # let cancelled producers notice and exit
    after = threading.active_count()
    assert after - before <= 1
