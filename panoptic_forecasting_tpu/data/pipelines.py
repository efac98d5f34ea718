"""Per-task dataset bundles (registry targets).

Reference capability: ``data/__init__.py:14-31`` — build per-split datasets
for a task and register the task collate_fn. Here each builder returns a
``TaskData`` bundle: split datasets + the DataCard handed to the model
builder (replacing the reference's params-mutation contract).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import numpy as np

from ..core.registry import register_dataset
from .cards import DataCard
from .loader import Loader, default_collate
from .odom_data import OdomDataset


@dataclasses.dataclass
class TaskData:
    datasets: Dict[str, Any]
    card: DataCard
    collate_fn: Callable = default_collate

    def loader(self, split: str, cfg: Dict[str, Any], test: bool = False,
               seed: int = 0) -> Loader:
        t = cfg.get("training", {})
        bs = int(t.get("batch_size", 32))
        # Input-pipeline parallelism: replaces the reference's
        # num_data_workers DataLoader forks (train.py:101-109) with an
        # in-process thread pool + background batch prefetch. ON by
        # default — every reference config runs 2-8 workers
        # (configs/bg/bg_train.yaml:45 num_data_workers: 8); a default of
        # 0 left out-of-box training decoding PNGs synchronously between
        # device steps.
        import os as _os

        default_threads = min(8, _os.cpu_count() or 1)
        threads = int(t.get("num_data_threads", default_threads))
        prefetch = int(t.get("prefetch_batches", 2 if threads else 0))
        if split != "train" or test:
            return Loader(
                self.datasets[split],
                int(t.get("val_batch_size") or bs),
                shuffle=False,
                drop_last=False,
                collate_fn=self.collate_fn,
                seed=seed,
                prefetch=prefetch,
                num_threads=threads,
            )
        steps = t.get("steps_per_epoch")
        accum = int(t.get("accumulate_steps", 1))
        return Loader(
            self.datasets[split],
            bs,
            shuffle=True,
            drop_last=True,
            collate_fn=self.collate_fn,
            steps_per_epoch=(int(steps) * accum) if steps else None,
            weights=cfg.get("sample_weights"),
            seed=seed,
            prefetch=prefetch,
            num_threads=threads,
        )


@register_dataset("odom")
def build_odom_data(cfg, test: bool = False) -> TaskData:
    card = DataCard(task="odom")
    splits = cfg.get("data", {}).get("data_splits", ["train", "val"])
    datasets = {s: OdomDataset(s, cfg, card, test=test) for s in splits}
    return TaskData(datasets=datasets, card=card)


@register_dataset("pc_transform")
def build_pc_transform_data(cfg, test: bool = False) -> TaskData:
    from .pc_data import PCTransformDataset

    card = DataCard(task="pc_transform")
    splits = cfg.get("data", {}).get("data_splits", ["val"])
    datasets = {s: PCTransformDataset(s, cfg, card, test=test) for s in splits}
    return TaskData(datasets=datasets, card=card)


@register_dataset("bg")
def build_bg_data(cfg, test: bool = False) -> TaskData:
    from .bg_data import BGDataset

    card = DataCard(task="bg")
    splits = cfg.get("data", {}).get("data_splits", ["train", "val"])
    datasets = {s: BGDataset(s, cfg, card, test=test) for s in splits}
    return TaskData(datasets=datasets, card=card)


@register_dataset("fg")
def build_fg_data(cfg, test: bool = False) -> TaskData:
    from .fg_data import FGInstanceDataset, FGSceneDataset, fg_scene_collate

    card = DataCard(task="fg")
    d = cfg.get("data", {})
    dataset_type = d.get("dataset_type", "fg_instance")
    splits = d.get("data_splits", ["train", "val"])
    if dataset_type == "fg_scene":
        cls, collate = FGSceneDataset, fg_scene_collate
    else:
        cls, collate = FGInstanceDataset, default_collate
    datasets = {s: cls(s, cfg, card, test=test) for s in splits}
    return TaskData(datasets=datasets, card=card, collate_fn=collate)
