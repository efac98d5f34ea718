"""Background (semantic forecast) dataset.

Reference capability: ``BGDataset`` (datasets/bg_dataset.py:25-232). One
sample = 3 reprojected segmentation PNGs (trainId space, produced by the
pc_transform export) + optional reprojected depth channels from
``depths_decompressed_{split}.h5`` + the fg-removed GT
``*_gtFine_labelTrainIds.png``. Trains jointly over several
``(data_dirs, gap_len)`` groups (mid + short term). With
``only_background: True`` num_classes = 11 stuff classes
(bg_dataset.py:61-65). Train-time augmentation = scale-jittered random crop
+ horizontal flip (bg_dataset.py:143-161).

Depth pipeline (bg_dataset.py:183-190, 223-228): h5 stores the uint16 PNG
encoding; decode d/256 − 1, invalid → −1, clamp to [min_depth, max_depth].
Depth normalization stats are computed on *decoded, clamped, valid* depths
of every 5th train file and cached to ``depth_norm_params_file`` — NOTE the
reference's in-repo stat computation clamps the *raw encoded* values
(bg_dataset.py:119-120), which is inconsistent with its own training-time
decode; since the shipped stats file makes that path dead in practice, we
compute on decoded depths (documented deviation).
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .cards import DataCard
from .io import LazyH5, load_png, load_png_batch
from .transforms import RandomHorizontalFlip, RandomScaleCrop, Resize


class BGDataset:
    def __init__(self, split: str, cfg: Dict[str, Any], card: DataCard,
                 test: bool = False):
        d = cfg.get("data", {})
        self.split = split
        self.test = test
        data_dir = d["data_dir"]
        self.data_inp_size = int(d.get("data_inp_size", 3))
        if isinstance(data_dir, list):
            dirs = [os.path.join(x, split) for x in data_dir]
            self.data_dirs = [
                dirs[i : i + self.data_inp_size]
                for i in range(0, len(dirs), self.data_inp_size)
            ]
        else:
            self.data_dirs = [[os.path.join(data_dir, split)] * self.data_inp_size]
        self.gt_dir = os.path.join(d["gt_dir"], split)
        self.gap_len: Sequence[int] = d.get("gap_len", [9])
        if np.isscalar(self.gap_len):
            self.gap_len = [int(self.gap_len)]
        self.use_depths = bool(d.get("use_depths"))
        self.min_depth = d.get("min_depth", 0.1)
        self.max_depth = d.get("max_depth", 200.0)
        self.resize_wh: Optional[Tuple[int, int]] = (
            (int(d["resize_w"]), int(d["resize_h"]))
            if d.get("resize_h") is not None
            else None
        )
        self.only_background = bool(d.get("only_background"))
        self.num_classes = 11 if self.only_background else 19
        card.num_classes = self.num_classes

        self.depth_h5 = None
        self._depth_dset_cache: Dict[str, Any] = {}
        self._depth_dset_pid = os.getpid()
        if self.use_depths:
            self.depth_h5 = LazyH5(d["depth_h5_path"] % split)
        # Default: ship the RAW uint16 depth block and decode it on the
        # (loader-starved) device — BGModel._prep_inputs, bit-identical;
        # the decode commutes with the NEAREST/crop/flip/pad transforms
        # (pointwise; raw pad value 0 decodes to invalid). Saves ~25 ms of
        # host numpy per sample (scripts/prof_train_pipeline.py).
        self.host_depth_decode = bool(d.get("host_depth_decode"))

        self.samples: List[Tuple[str, List[str], str, str, int, int, int]] = []
        for city in sorted(os.listdir(self.gt_dir)):
            for gt_file in sorted(
                glob.glob(os.path.join(self.gt_dir, city, "*_labelTrainIds.png"))
            ):
                name = os.path.basename(gt_file)
                parts = name.split("_")
                c, seq, frame = parts[0], parts[1], int(parts[2])
                for dirs, gap in zip(self.data_dirs, self.gap_len):
                    start_fr = int((9 - gap) / 3)
                    seg_name = f"{c}_{seq}_{frame:06d}_gtFine_labelIds.png"
                    files = [os.path.join(x, c, seg_name) for x in dirs]
                    self.samples.append(
                        (gt_file, files, c, seq, frame, 19, start_fr)
                    )
        # prepare_bg_data's optional raw .npy seg format (zero-decode,
        # mmap-able — cli/prepare_bg_data.py bg_out_format): detected by
        # the first sample; a tree mixes formats never.
        self.seg_npy = bool(self.samples) and (
            not os.path.exists(self.samples[0][1][0])
            and os.path.exists(self.samples[0][1][0][:-4] + ".npy")
        )
        if self.seg_npy:
            self.samples = [
                (gt, [f[:-4] + ".npy" for f in files], c, s, fr, t, sf)
                for gt, files, c, s, fr, t, sf in self.samples
            ]

        # depth normalization stats (train only)
        if split == "train" and not test and self.use_depths:
            stats_file = d.get("depth_norm_params_file")
            mean = std = None
            if stats_file and os.path.exists(stats_file):
                arr = np.load(stats_file)
                mean, std = float(arr[0]), float(arr[1])
            else:
                vals = []
                for i, (gt_file, files, c, seq, frame, fr, start_fr) in enumerate(
                    self.samples
                ):
                    if i % 5 != 0:
                        continue
                    dep = self._load_depth_block(c, seq, frame, start_fr)
                    dep = dep[dep > 0]
                    if dep.size:
                        vals.append(dep)
                if vals:
                    allv = np.concatenate(vals)
                    mean, std = float(allv.mean()), float(allv.std())
                else:
                    mean, std = 0.0, 1.0
                if stats_file:
                    os.makedirs(os.path.dirname(stats_file) or ".", exist_ok=True)
                    np.save(stats_file, np.array([mean, std], np.float32))
            card.set_stats("depth", np.array([mean]), np.array([std]))

        # transforms
        self.transforms = []
        if split == "train" and not test:
            if not d.get("no_resize_crop"):
                self.transforms.append(
                    RandomScaleCrop(
                        d.get("crop_size", 800),
                        scale_min=d.get("scale_min", 0.5),
                        scale_max=d.get("scale_max", 2.0),
                        ignore_index=255,
                    )
                )
            self.transforms.append(RandomHorizontalFlip())
        if self.resize_wh is not None:
            self.transforms.insert(0, Resize(self.resize_wh))
        self._epoch_seed = 0

    def set_epoch(self, epoch: int) -> None:
        """Per-epoch augmentation reseed (called by Loader.set_epoch)."""
        self._epoch_seed = int(epoch)

    def _raw_depth_block(self, city, seq, frame, start_fr) -> np.ndarray:
        """(H, W, T) raw uint16 block — memmap'd (lock-free page-cache
        read) when the dataset is contiguous, pid-guarded like the fg
        feats cache."""
        pid = os.getpid()
        if pid != self._depth_dset_pid:
            self._depth_dset_cache.clear()
            self._depth_dset_pid = pid
        key = f"{city}/{seq}/{frame:06d}/{start_fr}"
        d = self._depth_dset_cache.get(key)
        if d is None:
            d = self._depth_dset_cache[key] = self.depth_h5.mmap_dataset(key)
        return np.asarray(d[:])

    def _load_depth_block(self, city, seq, frame, start_fr) -> np.ndarray:
        """(H, W, T) decoded clamped depths (−1 invalid)."""
        raw = self._raw_depth_block(city, seq, frame, start_fr)
        dep = raw.astype(np.float32) / 256.0 - 1.0
        mask = dep > 0
        dep = np.where(mask, np.clip(dep, self.min_depth, self.max_depth), -1.0)
        return dep

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        gt_file, files, city, seq, frame, fr, start_fr = self.samples[idx]
        # Narrow dtypes through the whole host path: decode stays uint8/
        # uint16, widening happens after the crop (16x fewer pixels) or on
        # device — at full res the int32 conversions alone cost ~15 ms of
        # the 120 ms sample (scripts/prof_train_pipeline.py).
        gt = load_png(gt_file)
        if self.seg_npy:
            # zero-decode mmap views; the crop touches only its pages
            segs = [np.load(f, mmap_mode="r") for f in files]
        else:
            # one triplet shares geometry -> native threaded batch decode
            segs = list(load_png_batch(files))
        arrs = []
        if self.use_depths:
            if self.host_depth_decode:
                arrs.append(self._load_depth_block(city, seq, frame, start_fr))
            else:
                # raw (H, W, T) uint16; decoded in-graph
                arrs.append(self._raw_depth_block(city, seq, frame, start_fr))

        rng = np.random.RandomState(
            (hash((idx, self._epoch_seed)) & 0x7FFFFFFF)
        )
        for tr in self.transforms:
            segs, gt, arrs = tr(segs, gt, arrs, rng)

        out: Dict[str, Any] = {
            # uint8 to the device (4x less transfer); BGModel._prep_inputs
            # widens in-graph
            "inputs": {"seg": np.ascontiguousarray(np.stack(segs))},
            "labels": {"seg": gt.astype(np.int32)},
            "meta": {
                "city": city,
                "seq": seq,
                "frame": frame,
                "start_frame": start_fr,
                "target_frame": frame - 19 + fr,
            },
        }
        if self.use_depths:
            dep = np.moveaxis(arrs[0], -1, 0)  # (T, H, W)
            if self.host_depth_decode:
                dep = dep.astype(np.float32)
                out["inputs"]["depth"] = dep
                out["inputs"]["depth_mask"] = dep > 0
            else:
                # raw uint16; decode + mask happen in-graph
                out["inputs"]["depth"] = np.ascontiguousarray(dep)
        return out
