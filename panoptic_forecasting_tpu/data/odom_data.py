"""Odometry dataset: (speed, yaw_rate) forecast windows.

Reference capability: ``OdomDataset`` (datasets/odom_dataset.py:20-171) —
windows over per-snippet 30-frame odometry from ``{split}_3d_info.pkl`` (a
pandas pickle with columns city/seq/frame/odometry[(30, 5)]) or the
ORB-SLAM variant ``orbslam_odom_{split}.pkl`` (speed/yaw_rate columns);
9-in/9-out sliding windows over every start offset (clipped at frame 29),
plus two short-history samples per snippet whose input is left-padded by
repeating the first frame (odom_dataset.py:69-81,105-115); train split
computes the normalization stats every model consumes
(odom_dataset.py:56-68 → DataCard).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .cards import DataCard


class OdomDataset:
    def __init__(self, split: str, cfg: Dict[str, Any], card: DataCard,
                 test: bool = False):
        d = cfg.get("data", {})
        self.input_len = int(d.get("input_len", 9))
        self.output_len = int(d.get("output_len", 9))
        self.seq_len = self.input_len + self.output_len
        self.split = split
        self.test = test
        use_orbslam = bool(d.get("use_orbslam_odom"))

        import pandas as pd

        data_dir = d["data_dir"]
        if use_orbslam:
            frame = pd.read_pickle(os.path.join(data_dir, f"orbslam_odom_{split}.pkl"))
            odom = np.stack(
                [np.stack(list(frame["speed"])), np.stack(list(frame["yaw_rate"]))],
                axis=-1,
            ).astype(np.float32)  # (N, 30, 2)
        else:
            frame = pd.read_pickle(os.path.join(data_dir, f"{split}_3d_info.pkl"))
            odom = np.stack(list(frame["odometry"])).astype(np.float32)[..., :2]
        self.frame = frame
        self.odom = odom  # (N, 30, 2)

        if split == "train":
            flat = odom.reshape(-1, 2)
            card.set_stats("odom", flat.mean(0), flat.std(0))

        # Window index: (row, start_ind, frame indices). start_ind < 0 marks
        # the repeat-padded short-history samples.
        self.index: List[Tuple[int, int, np.ndarray]] = []
        base = np.arange(self.seq_len)
        fr_range = range(30 - (self.input_len if test else self.seq_len) + 1)
        for row in range(len(odom)):
            for start in fr_range:
                self.index.append((row, start, np.clip(start + base, None, 29)))
            self.index.append((row, -1, base[:-1]))
            self.index.append((row, -2, base[:-2]))

    def __len__(self) -> int:
        return len(self.index)

    def __getitem__(self, i: int) -> Dict[str, Any]:
        row, start, inds = self.index[i]
        odom = self.odom[row][inds]
        if start < 0:
            pad = np.repeat(odom[0:1], -start, axis=0)
            inp = np.concatenate([pad, odom[: self.input_len + start]], axis=0)
            out = odom[-self.output_len :]
            start_frame = int(inds[self.input_len - 1 + start])
        else:
            inp = odom[: self.input_len]
            out = odom[self.input_len :]
            start_frame = int(inds[self.input_len - 1])
        rec = self.frame.iloc[row]
        return {
            "inputs": {"odometry": inp.astype(np.float32)},
            "labels": {"odometry": out.astype(np.float32)},
            "meta": {
                "city": rec["city"],
                "seq": rec["seq"],
                "frame": int(rec["frame"]),
                "start_frame": start_frame,
            },
        }
