"""Joint spatial transforms for multi-image segmentation samples.

Reference capability: ``data/transforms.py`` (adapted there from NVIDIA
semantic-segmentation): ``RandomSizeAndCropMasks_Faster`` (pad→random
crop→NEAREST resize, :169-274), ``RandomHorizontallyFlip`` (:276-293),
``Resize`` (:296-324). Re-implemented on numpy arrays (no PIL round-trips);
label maps use NEAREST everywhere; auxiliary float arrays (depth) ride along
with their own interpolation.

All transforms take (segs, gt, arrs, rng) and return the same tuple shape:
``segs`` list of (H, W) int arrays, ``gt`` (H, W) int array, ``arrs`` list
of (H, W, C) float arrays.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2

    cv2.setNumThreads(0)  # avoid worker-fork deadlock (transforms.py:15-16)
except Exception:  # pragma: no cover
    cv2 = None


def _resize_nearest(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    if arr.shape[:2] == (h, w):
        return arr
    if cv2 is not None:
        out = cv2.resize(arr, dsize=(w, h), interpolation=cv2.INTER_NEAREST)
        if arr.ndim == 3 and out.ndim == 2:
            out = out[:, :, None]
        return out
    # numpy fallback: index mapping identical to cv2 INTER_NEAREST
    ys = np.minimum((np.arange(h) * arr.shape[0] / h).astype(int), arr.shape[0] - 1)
    xs = np.minimum((np.arange(w) * arr.shape[1] / w).astype(int), arr.shape[1] - 1)
    return arr[np.ix_(ys, xs)]


class RandomScaleCrop:
    """Scale-jittered random crop: pick s ∈ [scale_min, scale_max], cut a
    (crop·s) window (padding with ignore_index/0 if needed), resize back to
    crop size with NEAREST. Matches RandomSizeAndCropMasks_Faster
    (transforms.py:169-274)."""

    def __init__(self, size, scale_min=0.5, scale_max=2.0, ignore_index=255):
        self.size = (int(size), int(size)) if np.isscalar(size) else tuple(size)
        self.scale_min = scale_min
        self.scale_max = scale_max
        self.ignore_index = ignore_index

    def __call__(self, segs, gt, arrs, rng: np.random.RandomState):
        s = rng.uniform(self.scale_min, self.scale_max)
        crop_w = int(self.size[0] * s)
        crop_h = int(self.size[1] * s)
        h, w = segs[0].shape[:2]
        pad_h = (crop_h - h) // 2 + 1 if crop_h > h else 0
        pad_w = (crop_w - w) // 2 + 1 if crop_w > w else 0
        if pad_h or pad_w:
            pw = [(pad_h, pad_h), (pad_w, pad_w)]
            segs = [
                np.pad(x, pw, constant_values=self.ignore_index) for x in segs
            ]
            gt = np.pad(gt, pw, constant_values=self.ignore_index)
            arrs = [
                np.pad(a, pw + [(0, 0)] * (a.ndim - 2), constant_values=0)
                for a in arrs
            ]
            h, w = segs[0].shape[:2]
        x1 = 0 if w == crop_w else rng.randint(0, w - crop_w + 1)
        y1 = 0 if h == crop_h else rng.randint(0, h - crop_h + 1)
        segs = [x[y1 : y1 + crop_h, x1 : x1 + crop_w] for x in segs]
        gt = gt[y1 : y1 + crop_h, x1 : x1 + crop_w]
        arrs = [a[y1 : y1 + crop_h, x1 : x1 + crop_w] for a in arrs]
        tw, th = self.size
        segs = [_resize_nearest(x, tw, th) for x in segs]
        gt = _resize_nearest(gt, tw, th)
        arrs = [_resize_nearest(a, tw, th) for a in arrs]
        return segs, gt, arrs


class RandomHorizontalFlip:
    def __call__(self, segs, gt, arrs, rng: np.random.RandomState):
        if rng.rand() < 0.5:
            segs = [np.ascontiguousarray(np.fliplr(x)) for x in segs]
            gt = np.ascontiguousarray(np.fliplr(gt))
            arrs = [np.ascontiguousarray(np.fliplr(a)) for a in arrs]
        return segs, gt, arrs


class Resize:
    """Exact NEAREST resize to (w, h). Reference transforms.py:296-324."""

    def __init__(self, size: Tuple[int, int]):
        self.w, self.h = size

    def __call__(self, segs, gt, arrs, rng=None):
        segs = [_resize_nearest(x, self.w, self.h) for x in segs]
        gt = _resize_nearest(gt, self.w, self.h)
        arrs = [_resize_nearest(a, self.w, self.h) for a in arrs]
        return segs, gt, arrs
