"""One Orbax checkpoint format replacing the reference's four coexisting ones
(SURVEY §5 checkpoint/resume): per-epoch saves carrying params / opt_state /
model_state / step plus metrics, with

- top-k retention by a monitored metric (``ModelCheckpoint(save_top_k=3,
  monitor='val_acc')``, ``ntrain.py:221-229``) via ``best_fn``,
- every-N-epoch keeps (the second ModelCheckpoint, ``ntrain.py:230-236``)
  via ``keep_period``,
- filesystem auto-resume from the latest epoch (``finetune.py:107-148``'s
  scan, done properly by the manager),
- params-only extraction for serving (``--transform`` /
  ``TIC/utils/extract_ckpt.py`` analogue).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import orbax.checkpoint as ocp
from orbax.checkpoint.checkpoint_managers import preservation_policy as _pp

from ..config import CheckpointConfig


@dataclasses.dataclass(frozen=True)
class _LastNOfEveryK:
    """Keep only the last ``n`` of the every-``k``-epochs checkpoints.

    The reference's second ModelCheckpoint monitors 'epoch' with
    ``save_top_k=3, every_n_epochs=3`` (``TIC/ViT/ntrain.py:230-236``), i.e.
    the 3 NEWEST every-3rd-epoch saves — Orbax's ``keep_period`` instead
    preserves every k-th step forever, growing disk without bound over a
    long run. This policy caps it to the reference semantics.
    """

    k: int
    n: int

    def should_preserve(self, checkpoints, *, context):
        periodic = sorted(c.step for c in checkpoints if c.step % self.k == 0)
        keep = set(periodic[-self.n:])
        return [c.step in keep for c in checkpoints]


class CheckpointManager:
    def __init__(self, cfg: CheckpointConfig, run_name: str,
                 directory: str | None = None):
        """``directory`` overrides the default ``<cfg.directory>/<run_name>``
        location (the --restore <path> case)."""
        self.cfg = cfg
        self.directory = os.path.abspath(
            directory if directory else os.path.join(cfg.directory, run_name)
        )
        # retention = union of (a) top-k by the monitored metric
        # (ModelCheckpoint(save_top_k=3, monitor='val_acc'), ntrain.py:221-229),
        # (b) newest top_k of every-N-epoch saves (ntrain.py:230-236), and
        # (c) the latest epoch, so filesystem auto-resume never loses ground
        # even when the newest epoch is neither a top-k nor an every-N save
        policies: list[Any] = [_pp.LatestN(n=1)]
        if cfg.monitor:
            monitor = cfg.monitor
            policies.append(_pp.BestN(
                get_metric_fn=lambda m: float(m[monitor]),
                reverse=(cfg.mode == "min"),  # ascending sort keeps largest
                n=cfg.top_k,
            ))
        else:
            policies.append(_pp.LatestN(n=cfg.top_k))
        if cfg.every_n_epochs:
            policies.append(_LastNOfEveryK(k=cfg.every_n_epochs, n=cfg.top_k))
        options = ocp.CheckpointManagerOptions(
            preservation_policy=_pp.AnyPreservationPolicy(policies),
            best_fn=(lambda metrics: float(metrics[cfg.monitor])) if cfg.monitor else None,
            best_mode=cfg.mode,
            create=True,
            enable_async_checkpointing=cfg.async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, epoch: int, state: Any, metrics: dict) -> None:
        # scalars coerced to float for best_fn ordering; structured entries
        # (e.g. the trainer's persisted early-stop state) pass through to
        # Orbax's JSON metrics intact
        self._mgr.save(
            epoch,
            args=ocp.args.StandardSave(state),
            metrics={k: (float(v) if isinstance(v, (int, float)) else v)
                     for k, v in metrics.items()},
        )

    def latest_epoch(self) -> int | None:
        return self._mgr.latest_step()

    def metrics(self, step: int) -> dict | None:
        return self._mgr.metrics(step)

    def best_epoch(self) -> int | None:
        return self._mgr.best_step()

    def restore(self, state_template: Any, epoch: int | None = None) -> Any:
        epoch = epoch if epoch is not None else self.latest_epoch()
        if epoch is None:
            raise FileNotFoundError(f"No checkpoint under {self.directory}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state_template)
        return self._mgr.restore(epoch, args=ocp.args.StandardRestore(abstract))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_params(path: str, params: Any) -> None:
    """Bare-params export for serving (extract_ckpt.py:12-29 analogue)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_params(path: str, params_template: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    abstract = (
        jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, params_template)
        if params_template is not None else None
    )
    out = ckptr.restore(os.path.abspath(path), target=abstract)
    ckptr.close()
    return out
