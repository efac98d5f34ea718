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
        # Optional per-input-frame video frames (odom_dataset.py:130-148;
        # unused by every shipped config). Images resize so the SHORT side
        # equals min_img_len (torchvision Resize semantics) and come back
        # (T_in, h, w, 3) float32 in [0, 1].
        self.load_imgs = bool(d.get("load_imgs"))
        if self.load_imgs and not d.get("cityscapes_dir"):
            raise ValueError(
                "data.load_imgs requires data.cityscapes_dir (the"
                " leftImg8bit_sequence root) to be configured"
            )
        self.min_img_len = d.get("min_img_len")
        self.cityscapes_dir = d.get("cityscapes_dir")

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
        result = {
            "inputs": {"odometry": inp.astype(np.float32)},
            "labels": {"odometry": out.astype(np.float32)},
            "meta": {
                "city": rec["city"],
                "seq": rec["seq"],
                "frame": int(rec["frame"]),
                "start_frame": start_frame,
            },
        }
        if self.load_imgs:
            result["inputs"]["imgs"] = self._load_imgs(rec, start, inds)
        return result

    def _load_imgs(self, rec, start: int, inds: np.ndarray) -> np.ndarray:
        """Input-frame video images, short-history samples repeat-padded at
        the front (odom_dataset.py:130-148)."""
        from .io import load_png

        img_inds = inds[: self.input_len + (start if start < 0 else 0)]
        imgs = []
        for ind in img_inds:
            fr = int(rec["frame"]) - 19 + int(ind)
            path = os.path.join(
                self.cityscapes_dir, "leftImg8bit_sequence", self.split,
                rec["city"],
                f"{rec['city']}_{rec['seq']}_{fr:06d}_leftImg8bit.png",
            )
            img = load_png(path).astype(np.float32) / 255.0
            if self.min_img_len:
                img = _resize_short_side(img, int(self.min_img_len))
            imgs.append(img)
        if start < 0:
            imgs = [imgs[0]] * (-start) + imgs
        return np.stack(imgs)


def _resize_short_side(img: np.ndarray, min_len: int) -> np.ndarray:
    """Bilinear resize so the short side equals ``min_len`` (torchvision
    transforms.Resize(int) semantics)."""
    h, w = img.shape[:2]
    if h <= w:
        nh, nw = min_len, max(1, round(w * min_len / h))
    else:
        nh, nw = max(1, round(h * min_len / w)), min_len
    if (nh, nw) == (h, w):
        return img
    import cv2

    return cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
