"""Artifact IO: disparity/depth decoding, JSON, PNG, HDF5 helpers.

Implements (among others) the two functions the reference calls but never
shipped — ``data_utils.read_json_file`` and ``data_utils.load_depth``
(pc_transform_dataset.py:115,141,274; see SURVEY.md §2.10) — re-derived from
the Cityscapes disparity encoding and the inverse encodings visible at
export_cityscapes_segmentation_results.py:111-127 and bg_dataset.py:224-228.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image


def read_json_file(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def load_png(path: str) -> np.ndarray:
    """PNG read — libpng-backed when the native library is built
    (panoptic_forecasting_tpu/native), PIL otherwise."""
    from .. import native

    if native.available():
        return native.load_png(path)
    return np.array(Image.open(path))


def load_png_batch(paths) -> np.ndarray:
    """Decode N same-geometry PNGs into one (N, H, W[, C]) array.

    Uses the native threaded libpng decoder when built (the reference gets
    this parallelism from forked DataLoader workers, train.py:101-109);
    falls back to a sequential PIL loop."""
    from .. import native

    paths = list(paths)
    if native.available() and len(paths) > 1:
        try:
            return native.load_png_batch(paths)
        except Exception:
            pass  # mixed geometry / decode error: fall through per-file
    return np.stack([load_png(p) for p in paths])


# PNG write profiles (measured on 1024x2048 Cityscapes-like content,
# docs/perf_notes.md round 3). PNG is lossless under every profile; these
# trade encode time vs bytes:
#   PNG_IDS      id/label maps & binary masks: libpng's adaptive per-row
#                filter search is pure waste on flat regions — NONE-only
#                + level 1 encodes 4-6x faster (37->6 ms gray, 66->16 ms
#                panoptic RGB) for a few extra KiB.
#   PNG_SMOOTH16 16-bit depth/disparity gradients: keep adaptive row
#                filters (NONE blows up size 2.5x) but drop to level 1
#                (453->68 ms).
# 0x08 = libpng PNG_FILTER_NONE == native.FILTER_NONE (kept literal here:
# data.io must stay importable without triggering the native build;
# tests/test_native_io.py pins the two constants equal).
PNG_IDS = {"compress_level": 1, "filters": 0x08}
PNG_SMOOTH16 = {"compress_level": 1}


def save_png(path: str, arr: np.ndarray, compress_level: int = 6,
             filters: Optional[int] = None) -> None:
    from .. import native

    if native.available():
        native.save_png(
            path, np.asarray(arr), compress_level=compress_level,
            filters=native.FILTER_ADAPTIVE if filters is None else filters,
        )
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # PIL exposes compress_level only; the filter choice is a pure
    # speed/size tradeoff, so the fallback stays correct.
    Image.fromarray(arr).save(path, compress_level=compress_level)


class AsyncWriter:
    """Bounded thread pool for host-side artifact writes (PNG/npy/txt).

    Export loops interleave device steps with per-frame file writes (the
    reference writes synchronously inside its export loop,
    export_cityscapes_segmentation_results.py:53-127); offloading the
    encode+write overlaps host IO with the next batch's device step.
    ONLY pure host work may be submitted — JAX dispatch must stay on the
    caller's thread (dispatching from a worker deadlocks the tunneled
    TPU attachment, see cli/common.pipelined_map). Submitted arrays must
    not be mutated after ``submit``. ``max_pending`` bounds in-flight
    jobs (backpressure, so queued arrays can't exhaust host memory).
    The first worker exception re-raises on the caller's thread at the
    next ``submit()`` or at ``close()``. ``workers=0`` degrades to
    synchronous in-line calls.
    """

    def __init__(self, workers: int = 4, max_pending: int = 32):
        self._ex = None
        self._err: Optional[BaseException] = None
        if workers > 0:
            import threading
            from concurrent.futures import ThreadPoolExecutor

            self._ex = ThreadPoolExecutor(
                max_workers=workers, thread_name_prefix="pf-write"
            )
            self._slots = threading.Semaphore(max_pending)

    def submit(self, fn, *args, **kwargs) -> None:
        if self._err is not None:
            err, self._err = self._err, None
            raise err
        if self._ex is None:
            fn(*args, **kwargs)
            return
        self._slots.acquire()

        def job():
            try:
                fn(*args, **kwargs)
            except BaseException as e:  # surfaced on the caller's thread
                if self._err is None:
                    self._err = e
            finally:
                self._slots.release()

        self._ex.submit(job)

    def close(self) -> None:
        """Drain the queue; raise the first worker error, if any."""
        if self._ex is not None:
            self._ex.shutdown(wait=True)
            self._ex = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def __enter__(self) -> "AsyncWriter":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None:
            self.close()
        else:  # don't mask the in-flight exception with a writer error
            try:
                self.close()
            except BaseException:
                pass
        return False


def decode_disparity_png(png: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Cityscapes ``disparity_sequence`` uint16 PNG -> (disparity px, valid).

    Official encoding: p > 0 ⇒ d = (p − 1) / 256; p == 0 ⇒ invalid.
    """
    png = png.astype(np.float32)
    valid = png > 0
    disp = np.where(valid, (png - 1.0) / 256.0, 0.0)
    return disp, valid


def disparity_to_depth(
    disp: np.ndarray, valid: np.ndarray, baseline: float, fx: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Stereo disparity (px) -> metric depth: z = baseline·fx / d.

    Zero-disparity (infinitely far / sky) is marked invalid rather than inf.
    """
    ok = valid & (disp > 0)
    depth = np.where(ok, baseline * fx / np.maximum(disp, 1e-6), 0.0)
    return depth.astype(np.float32), ok


def load_depth(
    path: str,
    baseline: float,
    fx: float,
    use_cascade: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Load a disparity artifact and convert to (depth, valid_mask).

    Re-derivation of the unshipped ``data_utils.load_depth``
    (pc_transform_dataset.py:274-276): stereo ``*_disparity.png`` files decode
    with the Cityscapes rule; cascade-stereo outputs are float disparity maps
    (.npy or 16-bit PNG already in pixels).
    """
    if path.endswith(".npy"):
        disp = np.load(path)
        valid = disp > 0
    else:
        png = np.array(Image.open(path))
        if use_cascade:
            disp = png.astype(np.float32) / 256.0
            valid = png > 0
        else:
            disp, valid = decode_disparity_png(png)
    return disparity_to_depth(disp, valid, baseline, fx)


def encode_depth_png(depth: np.ndarray) -> np.ndarray:
    """Metric depth -> uint16 PNG payload: round((d+1).clip(0,255)·256).

    Inverse of the bg-dataset decode ``png/256 − 1`` (bg_dataset.py:224-228);
    matches the export at export_cityscapes_segmentation_results.py:119-123.
    Invalid depths (−1) encode to 0.
    """
    enc = (np.clip(depth + 1.0, 0.0, 255.0) * 256.0).round()
    return enc.astype(np.uint16)


def decode_depth_png(png: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """uint16 depth PNG -> (depth, valid); 0 ⇒ invalid (depth −1)."""
    valid = png > 0
    depth = np.where(valid, png.astype(np.float32) / 256.0 - 1.0, -1.0)
    return depth.astype(np.float32), valid


def encode_disparity_from_depth(
    depth: np.ndarray, disp_factor: float
) -> np.ndarray:
    """Depth -> uint16 disparity PNG as the reference exports it.

    Reference: export_cityscapes_segmentation_results.py:111-118
    (``disp = clamp(disp_factor / depth, 0, 255)·256`` for depth ≥ 0, else 0).
    """
    out = np.zeros_like(depth, dtype=np.float32)
    pos = depth >= 0
    out[pos] = np.clip(disp_factor / np.maximum(depth[pos], 1e-6), 0, 255) * 256.0
    return out.round().astype(np.uint16)


class LazyH5:
    """Per-process lazy HDF5 handle (fork-safe open-on-first-use).

    The reference re-opens h5 files inside each dataloader worker because
    HDF5 handles don't survive fork (bg_dataset.py:184-186,
    fg_instance_dataset.py:367-368); this wrapper gives the same safety with
    pid tracking instead of convention.
    """

    def __init__(self, path: str):
        import threading

        self.path = path
        self._fh = None
        self._pid: Optional[int] = None
        self._lock = threading.Lock()
        self._mm = None  # shared whole-file mapping for mmap_dataset

    def handle(self):
        import h5py

        pid = os.getpid()
        if self._fh is None or self._pid != pid:
            # Double-checked: the threaded loader (pf-loader pool) can hit
            # the first open concurrently; without the lock both threads
            # open the file and one handle leaks.
            with self._lock:
                if self._fh is None or self._pid != pid:
                    self._fh = h5py.File(self.path, "r")
                    self._pid = pid
        return self._fh

    def __getstate__(self):
        # Handles, locks, and mappings don't pickle; reopen lazily.
        return {"path": self.path}

    def __setstate__(self, state):
        self.__init__(state["path"])

    def __getitem__(self, key):
        return self.handle()[key]

    def mmap_dataset(self, key):
        """Zero-copy numpy view of a CONTIGUOUS uncompressed dataset —
        reads become plain page-cache memcpys, bypassing h5py's global
        lock and per-call overhead (the fg ROI-feature read dominated the
        loader profile; scripts/prof_train_pipeline methodology). All
        datasets share ONE whole-file mapping (a fresh np.memmap per
        dataset would hold one fd per scene — fd exhaustion at Cityscapes
        scale); the inherited mapping stays valid across fork for reads.
        Falls back to the live h5py dataset for chunked/compressed
        layouts."""
        import h5py

        d = self.handle()[key]
        try:
            if d.id.get_create_plist().get_layout() == h5py.h5d.CONTIGUOUS:
                off = d.id.get_offset()
                if off is not None and off >= 0:
                    if self._mm is None:
                        import mmap as _mmap

                        with self._lock:
                            if self._mm is None:
                                with open(self.path, "rb") as f:
                                    mm = _mmap.mmap(
                                        f.fileno(), 0,
                                        access=_mmap.ACCESS_READ,
                                    )
                                self._mm = np.frombuffer(mm, np.uint8)
                    return (
                        self._mm[off : off + d.nbytes]
                        .view(d.dtype)
                        .reshape(d.shape)
                    )
        except Exception:
            pass
        return d

    def close(self):
        if self._fh is not None:
            try:
                self._fh.close()
            finally:
                self._fh = None
