"""TreeViT staged-curriculum training (the ``TIC.TreeViT.train`` equivalent).

Reference flow (``TIC/TreeViT/train.py:139-179``): train the root on
(image -> category) via ``CategoryDataset``, then each son on its category's
class subset (``get_partial_dataset``), then the full tree. The reference
implementation is WIP-broken (undefined ``TREEVIT_TRAIN_SET_SIZE``, unset
``slogan``, unformatted monitor key, Datasets passed where loaders are
expected — SURVEY "Reference bugs to NOT reproduce"); this version fixes the
semantics and makes the curriculum TPU-parallel:

- stage ``root``: only root params train (CE on category labels),
- stage ``sons``: teacher-forced routing — every son trains on its own
  category's samples IN PARALLEL in one jitted step (the reference trains
  sons sequentially, one process per son),
- stage ``full``: end-to-end.

Category map: ``category.csv`` with columns ``class,category``
(``load_map_dict``, ``train.py:80-89``); when absent, a deterministic
partition of the sorted classes into N contiguous categories is generated
(the reference repo ships no category.csv at all).
"""
from __future__ import annotations

import csv
import dataclasses
import os

import numpy as np

from ..config import PRESETS, TreeViTConfig
from ..data.folder import scan_image_folder
from ..models.treevit import TreeViT
from .cli import apply_overrides, run, standard_argparser
from .tasks import TreeFullTask, TreeRootTask, TreeSonsTask


def load_map_dict(filename: str) -> dict[str, str]:
    """class name -> category name (``train.py:80-89``)."""
    with open(filename) as f:
        return {row["class"]: row["category"] for row in csv.DictReader(f)}


def make_class_to_category(
    map_dict: dict[str, str], class_to_idx: dict[str, int]
) -> np.ndarray:
    """int class idx -> int category idx; categories indexed by sorted name
    (the sklearn LabelEncoder equivalence, ``train.py:71-74,91-95``)."""
    categories = sorted(set(map_dict.values()))
    cat_to_idx = {c: i for i, c in enumerate(categories)}
    arr = np.zeros(len(class_to_idx), np.int32)
    for cls, idx in class_to_idx.items():
        arr[idx] = cat_to_idx[map_dict[cls]]
    return arr


def default_category_map(classes: list[str], num_categories: int) -> dict[str, str]:
    """Contiguous partition of sorted classes into N categories."""
    per = -(-len(classes) // num_categories)
    return {
        c: f"category_{i // per:02d}" for i, c in enumerate(sorted(classes))
    }


def _mask_for_stage(stage: str):
    if stage == "root":
        return lambda path: "root" in path
    if stage == "sons":
        return lambda path: "sons" in path
    return None  # full: everything trains


def main(argv=None):
    parser = standard_argparser("Train TreeViT with the staged curriculum")
    parser.add_argument("--stage", type=str, default="all",
                        choices=["root", "sons", "full", "all"])
    parser.add_argument("--map-file", type=str, default=None)
    parser.add_argument("--num-categories", type=int, default=8)
    parser.add_argument("--top-k", type=int, default=2)
    parser.add_argument("--tiny", action="store_true",
                        help="tiny ViT dims (CI/CPU smoke runs)")
    parser.add_argument("--small", action="store_true",
                        help="DeiT-Tiny-class dims at the full 224 input "
                             "(pixiv-scale runs on one chip)")
    args = parser.parse_args(argv)

    base_cfg = apply_overrides(PRESETS["treevit"], args)
    index = scan_image_folder(base_cfg.data_dir)

    map_file = args.map_file or TreeViTConfig().map_file
    if map_file and os.path.exists(map_file):
        map_dict = load_map_dict(map_file)
    else:
        map_dict = default_category_map(index.classes, args.num_categories)
    class_to_category = make_class_to_category(map_dict, index.class_to_idx)
    num_categories = int(class_to_category.max()) + 1

    node_vit = None
    if args.tiny:
        from ..config import ViTConfig
        from .cli import TINY_VIT_DIMS

        node_vit = ViTConfig(**TINY_VIT_DIMS)
    elif args.small:
        from ..config import ViTConfig
        from .cli import SMALL_VIT_DIMS

        node_vit = ViTConfig(**SMALL_VIT_DIMS)
    tree_cfg = TreeViTConfig(
        num_categories=num_categories,
        num_classes=len(index.classes),
        top_k=args.top_k,
        vit=node_vit,
    )
    model = TreeViT(tree_cfg)

    stages = ["root", "sons", "full"] if args.stage == "all" else [args.stage]
    task_cls = {"root": TreeRootTask, "sons": TreeSonsTask, "full": TreeFullTask}
    prev_params = None
    for i, stage in enumerate(stages):
        cfg = dataclasses.replace(
            base_cfg,
            train_id=f"{base_cfg.train_id}_{stage}",
            max_epochs=base_cfg.max_epochs,
        )
        stage_args = args
        if i > 0 and args.restore:
            # an explicit --restore seeds only the FIRST stage; re-restoring
            # it in every stage would clobber the prev_params chaining and
            # train stages 2+ from the wrong parameters
            import argparse as _ap

            stage_args = _ap.Namespace(**vars(args))
            stage_args.restore = None
        print(f"=== TreeViT stage: {stage} ===")
        trainer = run(cfg, stage_args, model=model,
                      task=task_cls[stage](tree_cfg, class_to_category),
                      param_filter=_mask_for_stage(stage),
                      init_params=prev_params)
        if trainer.state is not None:
            import jax

            prev_params = jax.device_get(trainer.state.params)
    return trainer


if __name__ == "__main__":
    main()
