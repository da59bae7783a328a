"""The unified trainer.

One implementation replaces both reference trainer styles (the hand-rolled
fp16-AMP loops of ``TIC/ViT/finetune.py:93-268`` / ``pretrain.py`` /
``ResNet/train.py`` and the Lightning modules of ``ntrain.py:16-248`` /
``ResMoE/train.py`` / ``TreeViT/train.py``), TPU-first:

- the *entire* step — uint8 batch -> on-device augmentation -> CutMix/MixUp
  -> bf16 forward/backward -> optimizer update — is one jitted XLA program,
- data parallelism from day one: batch sharded over the mesh's ``data`` axis,
  params replicated; XLA emits the gradient all-reduce over ICI; identical
  code on 1 chip, a v5e-8 slice, or the virtual CPU mesh in tests,
- bf16 compute / f32 params (no GradScaler needed, unlike fp16 AMP),
- non-finite updates are skipped via one fused gradient-norm finiteness
  check instead of the reference's loss-patching NaN workaround
  (``finetune.py:181-188``),
- Orbax per-epoch checkpoints with top-k + every-N retention and filesystem
  auto-resume,
- early stopping on a monitored val metric window (EarlyStopping,
  ``ntrain.py:237-238``; ``early_exit``, ``finetune.py:79-91``),
- optional frozen-backbone finetune (``full_finetune=False`` freezes all but
  the classifier head, ``ntrain.py:34-36``).
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
import signal
import threading
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import TrainConfig, get_image_size
from ..data.loader import device_put_iterator
from ..models import apply_model, create_model
from ..ops.augment import build_augment_fn, build_eval_fn
from ..ops.mixup import cutmix_or_mixup
from ..parallel.mesh import (
    create_mesh, data_sharding, make_global_array, process_input_view,
    put_global, replicated,
)
from ..parallel.sharding import shard_state
from ..utils.jaxcache import enable_compile_cache
from ..utils.logging import get_logger
from . import losses
from .checkpoint import CheckpointManager
from .optim import build_optimizer, fast_global_norm


def _fetch_scalars(metrics: dict) -> dict[str, float]:
    """Fetch every scalar metric in ONE host round trip: stack device-side,
    ship a single small vector. On the tunneled relay each leaf fetched
    separately is its own ~30 ms RTT (measured: leaf-wise device_get of 5
    scalars +10 ms/step vs this, which ties the single-loss-float fetch).
    Non-scalar leaves (if a task ever emits them) are skipped."""
    keys = [key for key, val in metrics.items()
            if getattr(val, "ndim", None) == 0]
    if not keys:
        return {}
    vec = np.asarray(jnp.stack([metrics[key].astype(jnp.float32)
                                for key in keys]))
    return dict(zip(keys, vec.tolist()))


def window_early_exit(timeline: list, patience: int, mode: str = "min") -> bool:
    """The hand-rolled loops' early-exit rule (``finetune.py:79-91``): stop
    when nothing in the last ``patience`` epochs improved on the value
    recorded just before that window. The comparison point slides with the
    window — the global best plays no role (unlike Lightning EarlyStopping).
    Ties count as "not improved", as in the reference's ``loss >= start``."""
    if not patience or len(timeline) < patience:
        return False
    sign = 1.0 if mode == "max" else -1.0
    window = timeline[-(patience + 1):]
    return all(sign * v <= sign * window[0] for v in window[1:])


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    model_state: Any


class ClassificationTask:
    """Default task: model outputs logits; CE on (possibly soft) targets.

    Tasks own (a) the forward (so families with auxiliary outputs or
    batch-dependent routing — MoE, TreeViT stages — can specialize it),
    (b) the loss on soft targets, and (c) logits extraction for eval.
    """

    def forward(self, model, variables, images, batch, train, rngs):
        return apply_model(model, variables, images, train=train, rngs=rngs)

    def loss(self, outputs, soft_labels):
        return losses.cross_entropy(outputs, soft_labels), {}

    def logits(self, outputs):
        return outputs

    def labels(self, batch):
        """Eval-space labels (TreeViT's root stage remaps to categories)."""
        return batch["label"]


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        model=None,
        task: ClassificationTask | None = None,
        mesh=None,
        init_params=None,
        param_filter=None,
    ):
        enable_compile_cache()
        self.cfg = cfg
        self.model = model if model is not None else create_model(cfg.model_type)
        self.task = task or ClassificationTask()
        self.mesh = mesh if mesh is not None else create_mesh(
            num_expert=cfg.mesh.num_expert_shards
        )
        self.logger = get_logger(cfg.train_id, cfg.log_dir)
        model_cfg = getattr(self.model, "cfg", None)
        # MoE/Tree carry their ViT architecture in a sub-config
        inner = getattr(model_cfg, "expert_vit", None) or getattr(model_cfg, "vit", None)
        size_src = inner if inner is not None else model_cfg
        if size_src is not None and isinstance(getattr(size_src, "image_size", None), int):
            self.out_size = (size_src.image_size, size_src.image_size)
        else:
            self.out_size = get_image_size(cfg.model_type)
        self.num_classes = getattr(self.model.cfg, "num_classes")
        self.augment_fn = build_augment_fn(cfg.augment, self.out_size)
        self.eval_transform = build_eval_fn(cfg.augment, self.out_size)
        self._base_key = jax.random.key(cfg.seed)
        self._init_params = init_params
        self.param_filter = param_filter
        self._batch_sharding = data_sharding(self.mesh, cfg.mesh.data_axis)
        self._replicated = replicated(self.mesh)
        # which slice of each global batch THIS process must load — derived
        # from actual device ownership, not process_count (a pure-EP mesh
        # replicates the batch across hosts: every host loads all of it)
        self._input_view = process_input_view(self._batch_sharding)
        self.tx: optax.GradientTransformation | None = None
        self.state: TrainState | None = None
        self._metrics_path = os.path.join(cfg.log_dir, cfg.train_id, "metrics.jsonl")
        # multi-host: exactly one process writes checkpoints/metrics (the
        # checkpoint dir is shared storage on a pod); all state is replicated
        # or re-shardable so any process could, but they must not collide
        self._is_main = jax.process_index() == 0

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------

    def _trainable_mask(self, params):
        """Trainable-parameter mask. Priority: explicit ``param_filter``
        (path tuple -> bool; used by TreeViT's staged curriculum), else
        full_finetune=False freezes everything but the head
        (``ntrain.py:34-36``), else everything trains."""
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        treedef = jax.tree_util.tree_structure(params)
        if self.param_filter is not None:
            mask = [self.param_filter(tuple(str(getattr(k, "key", k)) for k in path))
                    for path, _ in flat]
        elif not self.cfg.full_finetune:
            mask = [any("head" in str(k) for k in path) for path, _ in flat]
        else:
            mask = [True for _ in flat]
        return jax.tree_util.tree_unflatten(treedef, mask)

    def init_state(self, steps_per_epoch: int = 1) -> TrainState:
        dummy = jnp.zeros((1, *self.out_size, 3), jnp.float32)
        variables = self.model.init(jax.random.key(self.cfg.seed), dummy)
        variables = dict(variables)
        params = variables.pop("params")
        if self._init_params is not None:
            params = self._init_params
        model_state = variables  # batch_stats etc., possibly empty

        opt_cfg = self.cfg.optimizer
        if opt_cfg.schedule == "warmup_linear" and opt_cfg.total_steps <= 0:
            # wire the decay horizon when the caller didn't: without it the
            # LR would collapse to 0 one step after warmup
            opt_cfg = dataclasses.replace(
                opt_cfg,
                total_steps=max(
                    steps_per_epoch * self.cfg.max_epochs, opt_cfg.warmup_steps + 1
                ),
            )
        tx = build_optimizer(opt_cfg, steps_per_epoch, nan_guard=self.cfg.nan_guard)
        mask = self._trainable_mask(params)
        if not all(jax.tree_util.tree_leaves(mask)):
            tx = optax.multi_transform(
                {"train": tx, "frozen": optax.set_to_zero()},
                jax.tree_util.tree_map(lambda t: "train" if t else "frozen", mask),
            )
        self.tx = tx
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            model_state=model_state,
        )
        # replicated under pure DP; expert stacks sharded over the mesh's
        # expert axis when one exists (EP)
        return shard_state(state, self.mesh, self.cfg.mesh.expert_axis)

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _train_step_body(self) -> Callable:
        cfg = self.cfg
        model, task, tx = self.model, self.task, self.tx
        augment_fn = self.augment_fn
        num_classes = self.num_classes
        base_key = self._base_key

        def train_step(state: TrainState, batch):
            key = jax.random.fold_in(base_key, state.step)
            k_aug, k_mix, k_drop, k_gate = jax.random.split(key, 4)
            images = batch["image"].astype(jnp.float32) / 255.0
            images = augment_fn(k_aug, images)
            labels = jax.nn.one_hot(batch["label"], num_classes)
            if cfg.mix.enable_mixup:
                images, labels = cutmix_or_mixup(
                    k_mix, images, labels, cfg.mix.mixup_alpha, cfg.mix.cutmix_alpha
                )

            def loss_fn(params):
                outputs, new_ms = task.forward(
                    model,
                    {"params": params, **state.model_state},
                    images,
                    batch,
                    True,
                    {"dropout": k_drop, "gate": k_gate},
                )
                loss, aux = task.loss(outputs, labels)
                return loss, (new_ms, aux)

            (loss, (new_ms, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            grad_norm = fast_global_norm(grads)
            ms_commit = new_ms if new_ms else state.model_state
            if cfg.nan_guard:
                # one fused finiteness check; non-finite -> skip the update
                # (replaces the reference's loss-patching, finetune.py:181-188).
                # model_state is guarded too: a NaN batch's BatchNorm running
                # stats would otherwise poison every later step even though
                # the params update was skipped
                ok = jnp.isfinite(grad_norm) & jnp.isfinite(loss)
                new_params, new_opt_state, ms_commit = jax.lax.cond(
                    ok,
                    lambda: (new_params, new_opt_state, ms_commit),
                    lambda: (state.params, state.opt_state, state.model_state),
                )
            new_state = TrainState(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                model_state=ms_commit,
            )
            metrics = {"loss": loss, "grad_norm": grad_norm, **aux}
            return new_state, metrics

        return train_step

    def _with_ambient_mesh(self, fn: Callable) -> Callable:
        """Run ``fn`` under ``jax.sharding.set_mesh(self.mesh)``: model-
        internal sharding constraints (the MoE EP dispatch splitting expert
        capacity over 'data', ``models/resmoe.py::_constrain``) resolve
        against the ambient mesh at trace time. A no-op for models without
        constraints; applied at the step level so every caller of the jitted
        step (fit loop, tests, the multichip dryrun) gets it."""
        mesh = self.mesh

        def wrapped(*args):
            with jax.sharding.set_mesh(mesh):
                return fn(*args)

        return wrapped

    def _make_train_step(self) -> Callable:
        return self._with_ambient_mesh(
            jax.jit(self._train_step_body(), donate_argnums=(0,))
        )

    def _make_train_scan(self, k: int) -> Callable:
        """k fused optimizer steps per call: batches stacked on a leading
        axis, scanned inside one jitted program (amortizes dispatch)."""
        body = self._train_step_body()

        def scan_fn(state: TrainState, batches):
            state, ms = jax.lax.scan(body, state, batches)
            return state, jax.tree_util.tree_map(jnp.mean, ms)

        return self._with_ambient_mesh(jax.jit(scan_fn, donate_argnums=(0,)))

    def _make_eval_step(self) -> Callable:
        model, task = self.model, self.task
        eval_transform = self.eval_transform
        num_classes = self.num_classes

        def eval_step(state: TrainState, batch, totals):
            """Accumulates (loss_sum, correct, total) ON DEVICE — the loop
            fetches once at the end instead of once per batch (each fetch is
            a full RTT on the tunneled chip)."""
            images = eval_transform(batch["image"].astype(jnp.float32) / 255.0)
            outputs, _ = task.forward(
                model, {"params": state.params, **state.model_state}, images,
                batch, False, None,
            )
            logits = task.logits(outputs)
            labels = task.labels(batch)
            mask = batch["mask"]
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            per_sample = -logp[jnp.arange(labels.shape[0]), labels]
            loss_sum = jnp.sum(per_sample * mask)
            correct, total = losses.accuracy(logits, labels, mask)
            return (totals[0] + loss_sum, totals[1] + correct, totals[2] + total)

        return self._with_ambient_mesh(jax.jit(eval_step, donate_argnums=(2,)))

    # ------------------------------------------------------------------
    # loops
    # ------------------------------------------------------------------

    def _log_metrics(self, record: dict) -> None:
        if not self._is_main:
            return
        os.makedirs(os.path.dirname(self._metrics_path), exist_ok=True)
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def _saveable_state(self) -> Any:
        """What to hand the checkpoint manager.

        Multi-process: the live sharded ``jax.Array`` state — Orbax
        coordinates the save (EVERY process must call ``save``; each writes
        only its addressable shards, so EP-sharded expert stacks land on
        disk without ever being gathered). Single-process: fetch to host
        numpy (detaches the tunneled-TPU buffers immediately)."""
        if jax.process_count() > 1:
            return self.state
        return jax.device_get(self.state)

    def _agree_preempted(self) -> bool:
        """Cluster-wide preemption agreement.

        A SIGTERM lands on ONE host; if that process alone broke out of the
        epoch the survivors would deadlock in their next collective. Every
        step each process contributes its local flag to a tiny
        device-sharded vector and the jitted ``any`` reduction replicates
        the verdict — all processes break together at the same step, or
        none do. Single-process: just the local flag (no collective, no
        per-step host fetch on the tunneled chip)."""
        if jax.process_count() == 1:
            return self._preempted
        from jax.sharding import NamedSharding, PartitionSpec as P

        agree = getattr(self, "_agree_fn", None)
        if agree is None:
            sharded = NamedSharding(self.mesh, P(self.mesh.axis_names))
            rep = NamedSharding(self.mesh, P())
            fn = jax.jit(jnp.any, out_shardings=rep)
            n_local = sum(
                1 for d in self.mesh.devices.flat
                if d.process_index == jax.process_index()
            )

            def agree(flag: bool) -> bool:
                local = np.full((n_local,), flag)
                return bool(fn(make_global_array(local, sharded)))

            self._agree_fn = agree
        return agree(self._preempted)

    def _stacked_iterator(self, loader, k: int):
        """Group k host batches, stack on a new leading axis, and place them
        with the per-step batch dim sharded over 'data'."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self.mesh, P(None, self.cfg.mesh.data_axis))
        group: list[dict] = []
        for batch in loader:
            group.append(batch)
            if len(group) == k:
                stacked = {
                    key: np.stack([g[key] for g in group]) for key in group[0]
                }
                yield put_global(stacked, sharding)
                group = []
        # drop the ragged tail (train loaders already drop_last per epoch)

    def _apply_input_view(self, loader) -> None:
        if loader is not None and hasattr(loader, "set_process_view"):
            loader.set_process_view(*self._input_view)

    def evaluate(self, loader, state: TrainState | None = None, limit: int = 0):
        state = state if state is not None else self.state
        self._apply_input_view(loader)
        eval_step = getattr(self, "_eval_step", None)
        if eval_step is None:
            eval_step = self._eval_step = self._make_eval_step()
        totals = (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32),
                  jnp.zeros((), jnp.int32))
        for i, batch in enumerate(device_put_iterator(iter(loader), self._batch_sharding)):
            if limit and i >= limit:
                break
            totals = eval_step(state, batch, totals)
        # single host fetch for the whole eval pass
        loss_sum, correct, total = (float(totals[0]), int(totals[1]),
                                    int(totals[2]))
        if total == 0:
            # a NaN val_loss would flow into the checkpoint metrics and
            # corrupt best-k retention/best_step selection — fail loudly
            # (every process computes the same global total, so a multi-host
            # run raises on all hosts together)
            raise ValueError(
                "evaluate: no valid samples (empty val split or every "
                "image masked); check train_split/data_dir")
        return {"val_loss": loss_sum / total, "val_acc": correct / total}

    def fit(self, train_loader, val_loader=None, resume: bool | str = True):
        cfg = self.cfg
        self._apply_input_view(train_loader)
        steps_per_epoch = train_loader.steps_per_epoch()
        if cfg.limit_train_batches:
            steps_per_epoch = min(steps_per_epoch, cfg.limit_train_batches)
        k = max(1, cfg.steps_per_call)
        if k > 1 and steps_per_epoch % k:
            # the stacked iterator consumes whole k-groups; say so instead of
            # silently training fewer steps than the epoch accounting claims
            # (drop_last guarantees divisibility by batch_size, not by k)
            dropped = steps_per_epoch % k
            self.logger.warning(
                "steps_per_call=%d does not divide %d steps/epoch: the last "
                "%d batch(es) of every epoch are dropped (drop_last-style; "
                "reshuffled each epoch)", k, steps_per_epoch, dropped,
            )
            steps_per_epoch -= dropped
        self.state = self.init_state(steps_per_epoch)
        ckpt = CheckpointManager(cfg.checkpoint, cfg.train_id)
        # Mid-epoch preemption checkpoints live in a `<run>_partial` sibling
        # directory, keyed by GLOBAL optimizer step (monotonic -> never
        # collides with a re-run of the same epoch); only the newest is
        # retained. The manager is built lazily so non-preempted runs never
        # create the directory.

        partial_dir = ckpt.directory + "_partial"
        # monitor MUST be set: Orbax only persists per-step metrics when the
        # manager has a best_fn — with monitor=None the resume metadata
        # (epoch_index/steps_done) would never reach disk and a fresh
        # process would silently restart the epoch instead of resuming
        # mid-epoch (caught by test_sigterm_preemption_*'s loss assert)
        partial_cfg = dataclasses.replace(
            cfg.checkpoint, monitor="steps_done", mode="max", top_k=1,
            every_n_epochs=0, async_save=False,
        )
        _partial_box: list[CheckpointManager] = []

        def partial_mgr() -> CheckpointManager:
            if not _partial_box:
                _partial_box.append(CheckpointManager(
                    partial_cfg, cfg.train_id, directory=partial_dir))
            return _partial_box[0]

        def partial_on_disk() -> bool:
            return os.path.isdir(partial_dir) and any(
                d.isdigit() for d in os.listdir(partial_dir))

        def purge_partial() -> None:
            """Stale mid-epoch saves from an abandoned lineage must never
            resurrect (or outrank a fresh save under LatestN retention)."""
            if partial_on_disk():
                m = partial_mgr()
                for s in list(m._mgr.all_steps()):
                    m._mgr.delete(s)

        start_epoch = 0
        resume_offset = 0
        es_meta: dict | None = None  # early-stop state of the resumed ckpt
        if isinstance(resume, str) and resume:
            # --restore <path>: restore from an explicit checkpoint dir
            # (reference ckpt_path semantics) while new saves go to the
            # run's own directory
            src = CheckpointManager(cfg.checkpoint, cfg.train_id,
                                    directory=resume)
            if src.latest_epoch() is None:
                raise FileNotFoundError(f"No checkpoint under {resume}")
            self.state = shard_state(
                src.restore(self.state), self.mesh, cfg.mesh.expert_axis
            )
            start_epoch = int(src.latest_epoch())
            es_meta = src.metrics(start_epoch)
            src.close()
            self.logger.info("Restored %s (epoch %d)", resume, start_epoch)
            purge_partial()  # explicit restore starts a new lineage
        elif resume:
            # auto-resume from the NEWER of the full-epoch and mid-epoch
            # checkpoints (decided before restoring — a full multi-GB
            # restore must not be read just to be thrown away). A mid-epoch
            # restore fast-forwards the loader: no batch is trained twice
            # and none is skipped (per-step RNG is keyed by state.step, so
            # augmentation/mixup streams continue exactly).
            full_epoch = ckpt.latest_epoch()
            meta = None
            if partial_on_disk():
                pstep = partial_mgr().latest_epoch()
                meta = partial_mgr().metrics(pstep) if pstep is not None else None
            p_epoch = int(meta.get("epoch_index", -1)) if meta else -1
            # a partial is live only if it is at/after the full-epoch resume
            # point OF THIS LINEAGE. With no full save at all, accept only an
            # epoch-0 partial: a later-epoch partial whose full saves are
            # gone means the user deleted the run dir to start over — the
            # orphan must not resurrect (and gets purged below).
            partial_live = meta is not None and (
                p_epoch >= full_epoch if full_epoch is not None
                else p_epoch == 0
            )
            if partial_live:
                self.state = shard_state(
                    partial_mgr().restore(self.state), self.mesh,
                    cfg.mesh.expert_axis,
                )
                start_epoch = p_epoch
                resume_offset = int(meta.get("steps_done", 0))
                es_meta = meta
                self.logger.info(
                    "Resumed mid-epoch %d at batch %d (preemption "
                    "checkpoint, global step %d)",
                    start_epoch + 1, resume_offset, pstep,
                )
                self._log_metrics({"resumed_mid_epoch": start_epoch + 1,
                                   "start_batch": resume_offset,
                                   "global_step": int(pstep)})
                # resume_offset == steps_per_epoch (preempted during the
                # epoch's very last step) is handled by the epoch loop: it
                # yields zero batches and still runs val + the FULL save the
                # preempted run never got to write
            elif full_epoch is not None:
                self.state = shard_state(
                    ckpt.restore(self.state), self.mesh, cfg.mesh.expert_axis
                )
                start_epoch = int(full_epoch)
                es_meta = ckpt.metrics(start_epoch)
                self.logger.info("Resumed from epoch %d", start_epoch)
                if meta is not None:
                    purge_partial()  # older than the full save: stale
            elif meta is not None:
                purge_partial()  # orphan from a deleted lineage
        else:
            purge_partial()  # resume=False: fresh lineage

        train_step = self._make_train_scan(k) if k > 1 else self._make_train_step()
        history: list[dict] = []
        best = -math.inf if cfg.early_stop_mode == "max" else math.inf
        since_best = 0
        sign = 1.0 if cfg.early_stop_mode == "max" else -1.0
        timeline: list[float] = []
        # early-stop state travels WITH the checkpoint: a resumed run must
        # remember how long the metric has stagnated, or it trains up to
        # `patience` extra epochs vs the uninterrupted control
        es = (es_meta or {}).get("early_stop") or {}
        if es:
            timeline = [float(x) for x in es.get("timeline", [])]
            if es.get("best") is not None:
                best = float(es["best"])
            since_best = int(es.get("since_best", 0))

        def _es_state() -> dict:
            state = {
                "since_best": since_best,
                # window_early_exit only looks at the last patience+1 entries
                "timeline": timeline[-(cfg.early_stop_patience + 1):],
            }
            if math.isfinite(best):
                state["best"] = best
            return state

        # Preemption safety: TPU VMs receive SIGTERM on maintenance events /
        # spot reclaim. Checkpoint at the next step boundary and stop
        # cleanly; the filesystem auto-resume above picks the run back up.

        self._preempted = False
        prev_sigterm = None
        handler_installed = False

        def _on_sigterm(signum, frame):
            self._preempted = True
            self.logger.warning(
                "SIGTERM received: checkpointing at the next step boundary "
                "and stopping."
            )

        if threading.current_thread() is threading.main_thread():
            prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
            handler_installed = True

        profiled = False
        try:
            for epoch in range(start_epoch, cfg.max_epochs):
                t0 = time.time()
                running, nsteps = 0.0, 0
                # epoch means of every scalar the task emits (grad_norm plus
                # task aux, e.g. MoE routing telemetry: balance_loss,
                # drop_frac, expert_load_max/min). The loss fetch is already
                # the per-step sync point; _fetch_scalars ships ALL scalars
                # in that same single round trip (measured on the relay:
                # leaf-by-leaf device_get costs +10 ms/step, a device-side
                # stack + one vector fetch costs nothing).
                aux_running: dict[str, float] = {}
                # consumed counts LOADER batches trained this run (profiling
                # re-trains one batch profile_steps times, inflating nsteps
                # but not consumed — the resume offset must track data, not
                # optimizer steps, or resume would skip never-trained data)
                consumed = 0
                epoch_offset = resume_offset if epoch == start_epoch else 0
                if hasattr(train_loader, "set_epoch"):
                    # reproducible (seed, epoch)-keyed shuffle across
                    # restarts + fast-forward past already-trained batches
                    train_loader.set_epoch(epoch, epoch_offset)
                elif epoch_offset:
                    self.logger.warning(
                        "loader has no set_epoch(); cannot fast-forward %d "
                        "batches — the first %d steps of epoch %d repeat.",
                        epoch_offset, epoch_offset, epoch + 1,
                    )
                if k > 1:
                    it = self._stacked_iterator(train_loader, k)
                else:
                    it = device_put_iterator(iter(train_loader), self._batch_sharding)
                for i, batch in enumerate(it):
                    if self._agree_preempted():
                        # cluster-wide agreement: every process breaks at the
                        # SAME step or none does (a lone leaver would deadlock
                        # the others' next collective)
                        self._preempted = True
                        break
                    if (cfg.limit_train_batches
                            and epoch_offset + i * k >= cfg.limit_train_batches):
                        break
                    if cfg.profile_dir and not profiled and i == 1:
                        # trace a few steady-state steps once per run
                        from ..utils.profiling import trace

                        with trace(cfg.profile_dir):
                            for _ in range(cfg.profile_steps):
                                self.state, metrics = train_step(self.state, batch)
                                fetched = _fetch_scalars(metrics)
                                running += fetched["loss"] * k
                                for mk, mv in fetched.items():
                                    if mk != "loss":
                                        aux_running[mk] = (
                                            aux_running.get(mk, 0.0)
                                            + mv * k)
                                nsteps += k
                        profiled = True
                        consumed += k
                        continue
                    self.state, metrics = train_step(self.state, batch)
                    fetched = _fetch_scalars(metrics)
                    running += fetched["loss"] * k
                    for mk, mv in fetched.items():
                        if mk != "loss":
                            aux_running[mk] = (aux_running.get(mk, 0.0)
                                               + mv * k)
                    nsteps += k
                    consumed += k
                dt = time.time() - t0
                train_loss = running / max(nsteps, 1)
                # ONE post-loop agreement per epoch: a SIGTERM that lands
                # after a host's last in-loop check (during the epoch's final
                # step) must still be agreed, or that host alone would take
                # the cooperative-save/break path below and the others would
                # sail into eval/save collectives — a deadlock. Every process
                # calls this exactly once per epoch, whichever way the inner
                # loop ended, so the collectives stay matched.
                if self._agree_preempted():
                    self._preempted = True
                    done = epoch_offset + consumed
                    if nsteps:
                        gstep = int(jax.device_get(self.state.step))
                        partial_mgr().save(
                            gstep, self._saveable_state(),
                            {"epoch_index": float(epoch),
                             "steps_done": float(done),
                             # mid-epoch state == state after the last
                             # COMPLETED epoch; resume restores it
                             "early_stop": _es_state()},
                        )
                        partial_mgr().wait()
                        self.logger.info(
                            "Preemption checkpoint saved mid-epoch %d "
                            "(batch %d/%d, global step %d).",
                            epoch + 1, done, steps_per_epoch, gstep,
                        )
                    self._log_metrics({"epoch": epoch + 1, "preempted": True,
                                       "steps": done})
                    break
                record = {
                    "epoch": epoch + 1,
                    "train_loss": train_loss,
                    "epoch_seconds": dt,
                    "images_per_second": nsteps * cfg.global_batch_size / dt if dt else 0.0,
                }
                for mk, mv in aux_running.items():
                    record.setdefault(mk, mv / max(nsteps, 1))
                if val_loader is not None:
                    record.update(
                        self.evaluate(val_loader, self.state, cfg.limit_val_batches)
                    )
                self.logger.info(
                    "epoch %d: %s", epoch + 1,
                    " ".join(f"{k}={v:.5g}" for k, v in record.items() if k != "epoch"),
                )
                self._log_metrics(record)
                history.append(record)

                metric_key = cfg.early_stop_monitor
                # update early-stop state BEFORE the save so it is persisted
                # with the checkpoint it describes; the stop itself happens
                # after the save (this epoch's checkpoint is still written,
                # as before)
                stop = False
                if metric_key in record:
                    cur = record[metric_key]
                    if cfg.early_stop_window:
                        timeline.append(cur)
                        stop = window_early_exit(
                            timeline, cfg.early_stop_patience,
                            cfg.early_stop_mode)
                    elif sign * cur > sign * best:
                        best = cur
                        since_best = 0
                    else:
                        since_best += 1
                        stop = bool(cfg.early_stop_patience
                                    and since_best >= cfg.early_stop_patience)
                metrics_for_ckpt = {
                    k: v for k, v in record.items() if isinstance(v, (int, float))
                }
                if cfg.checkpoint.monitor not in metrics_for_ckpt:
                    # no val loader: substitute train loss, sign-adjusted so the
                    # manager's best-mode ordering still prefers lower loss.
                    # A boundary-resume epoch trained zero steps here (it only
                    # exists to write the full save the preempted run missed)
                    # — rank it never-best, not as a fake loss of 0.0
                    if nsteps:
                        fallback = (-train_loss if cfg.checkpoint.mode == "max"
                                    else train_loss)
                    else:
                        fallback = (-math.inf if cfg.checkpoint.mode == "max"
                                    else math.inf)
                    metrics_for_ckpt[cfg.checkpoint.monitor] = fallback
                metrics_for_ckpt["early_stop"] = _es_state()
                ckpt.save(epoch + 1, self._saveable_state(), metrics_for_ckpt)

                if stop:
                    self.logger.info(
                        "%s has not improved for %d epochs. Stopping training.",
                        metric_key, cfg.early_stop_patience,
                    )
                    break
        finally:
            if handler_installed:
                # prev may be None for a handler installed outside Python
                # (C level); SIG_DFL is the closest restorable behavior —
                # never leave our flag-only handler active after fit()
                signal.signal(signal.SIGTERM,
                              prev_sigterm if prev_sigterm is not None
                              else signal.SIG_DFL)
            ckpt.wait()
            ckpt.close()
            if _partial_box:
                _partial_box[0].close()
        return history

    def test(self, test_loader, state: TrainState | None = None):
        """trainer.test(...) analogue (``ntrain.py:245-248``)."""
        out = self.evaluate(test_loader, state)
        return {"test_loss": out["val_loss"], "test_acc": out["val_acc"]}
