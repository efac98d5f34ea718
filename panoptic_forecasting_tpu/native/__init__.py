"""ctypes binding for the C++ native IO library (native/pf_native.cpp).

The library is auto-built with ``make`` on first import when the shared
object is missing; every entry point has a pure-Python fallback (PIL /
numpy) so the framework works without a toolchain. ``available()`` reports
whether the native path is active.

Reference capability: the host-side data plane the reference delegates to
OpenCV / PIL-C / HDF5 (SURVEY §2.13) — batched threaded PNG decode, LUT
relabeling, depth/disparity codecs, nearest-neighbor label resize.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_DIR, "libpf_native.so")

_lib = None


_failed = False  # build/load already failed once: don't retry per IO call


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None:
        return _lib
    if _failed:
        return None

    def fail(msg: str) -> None:
        global _failed
        _failed = True
        print(f"WARNING: native IO disabled ({msg}); using PIL/numpy "
              "fallbacks")

    src = os.path.join(_DIR, "pf_native.cpp")
    stale = os.path.exists(_SO) and os.path.exists(src) and (
        os.path.getmtime(src) > os.path.getmtime(_SO)
    )
    if not os.path.exists(_SO) or stale:
        # A stale .so must never load against a newer ctypes signature —
        # rebuild (make's mtime rule is the incremental decision), and
        # refuse to load if that is impossible.
        if not os.path.exists(os.path.join(_DIR, "Makefile")):
            if stale:
                fail(f"{_SO} is older than {src} and no Makefile to rebuild")
            else:
                fail(f"{_SO} missing and no Makefile to build it")
            return None
        try:
            subprocess.run(
                ["make", "-C", _DIR], check=True, capture_output=True,
                timeout=120,
            )
        except Exception as e:
            fail(f"build failed: {e!r}")
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        fail(f"dlopen failed: {e}")
        return None
    lib.pf_png_probe.argtypes = [ctypes.c_char_p] + [
        ctypes.POINTER(ctypes.c_int32)
    ] * 4
    lib.pf_png_read.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.pf_png_write.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.pf_png_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.pf_lut_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p
    ]
    lib.pf_decode_depth_png_u16.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p
    ]
    lib.pf_disparity_to_depth_u16.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_float,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.pf_resize_nearest_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _probe(lib, path: str) -> Tuple[int, int, int, int]:
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    c = ctypes.c_int32()
    b = ctypes.c_int32()
    rc = lib.pf_png_probe(path.encode(), ctypes.byref(h), ctypes.byref(w),
                          ctypes.byref(c), ctypes.byref(b))
    if rc != 0:
        raise IOError(f"pf_png_probe({path}) failed: {rc}")
    return h.value, w.value, c.value, b.value


def load_png(path: str) -> np.ndarray:
    """PNG -> array (H, W[, C]); uint8 or uint16 by bit depth."""
    lib = _load()
    if lib is None:
        from PIL import Image

        return np.array(Image.open(path))
    h, w, c, b = _probe(lib, path)
    dtype = np.uint16 if b == 16 else np.uint8
    out = np.empty((h, w, c) if c > 1 else (h, w), dtype)
    rc = lib.pf_png_read(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                         h, w, c, b)
    if rc != 0:
        raise IOError(f"pf_png_read({path}) failed: {rc}")
    return out


# libpng PNG_FILTER_* mask: NONE-only skips the per-row adaptive filter
# search — near-free to encode and near-optimal for flat id/label maps.
FILTER_NONE = 0x08
FILTER_ADAPTIVE = -1  # libpng default: try all 5 filters per row


def save_png(path: str, arr: np.ndarray, compress_level: int = 6,
             filters: int = FILTER_ADAPTIVE) -> None:
    lib = _load()
    arr = np.ascontiguousarray(arr)
    if arr.dtype == np.int32 and arr.max(initial=0) < 65536 and arr.min(
        initial=0
    ) >= 0:
        arr = arr.astype(np.uint16)
    if lib is None or arr.dtype not in (np.uint8, np.uint16):
        from PIL import Image

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        Image.fromarray(arr).save(path)
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    c = 1 if arr.ndim == 2 else arr.shape[2]
    b = 16 if arr.dtype == np.uint16 else 8
    rc = lib.pf_png_write(path.encode(),
                          arr.ctypes.data_as(ctypes.c_void_p),
                          arr.shape[0], arr.shape[1], c, b, compress_level,
                          filters)
    if rc != 0:
        raise IOError(f"pf_png_write({path}) failed: {rc}")


def load_png_batch(paths: Sequence[str],
                   num_threads: int = 0) -> np.ndarray:
    """Decode n same-geometry PNGs into one (N, H, W[, C]) array using the
    native thread pool (falls back to a Python loop)."""
    paths = list(paths)
    lib = _load()
    if lib is None or not paths:
        return np.stack([load_png(p) for p in paths])
    h, w, c, b = _probe(lib, paths[0])
    dtype = np.uint16 if b == 16 else np.uint8
    shape = (len(paths), h, w, c) if c > 1 else (len(paths), h, w)
    out = np.empty(shape, dtype)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    if num_threads <= 0:
        num_threads = min(len(paths), os.cpu_count() or 1)
    rc = lib.pf_png_read_batch(arr, len(paths),
                               out.ctypes.data_as(ctypes.c_void_p),
                               h, w, c, b, num_threads)
    if rc != 0:
        raise IOError(f"pf_png_read_batch failed: {rc}")
    return out


def lut_apply_u8(arr: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """256-entry LUT relabel; returns a new array."""
    lib = _load()
    if lib is None:
        return lut.astype(np.uint8)[arr]
    out = np.ascontiguousarray(arr, np.uint8).copy()
    lut = np.ascontiguousarray(lut, np.uint8)
    lib.pf_lut_u8(out.ctypes.data_as(ctypes.c_void_p), out.size,
                  lut.ctypes.data_as(ctypes.c_void_p))
    return out


def decode_depth_png_u16(png: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(depth float32, valid bool): p/256 - 1, 0 = invalid."""
    lib = _load()
    png = np.ascontiguousarray(png, np.uint16)
    if lib is None:
        valid = png > 0
        return np.where(valid, png.astype(np.float32) / 256.0 - 1.0, -1.0), valid
    depth = np.empty(png.shape, np.float32)
    valid = np.empty(png.shape, np.uint8)
    lib.pf_decode_depth_png_u16(png.ctypes.data_as(ctypes.c_void_p),
                                png.size,
                                depth.ctypes.data_as(ctypes.c_void_p),
                                valid.ctypes.data_as(ctypes.c_void_p))
    return depth, valid.astype(bool)


def disparity_to_depth_u16(png: np.ndarray,
                           baseline_fx: float) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    png = np.ascontiguousarray(png, np.uint16)
    if lib is None:
        disp = (png.astype(np.float32) - 1.0) / 256.0
        valid = (png > 0) & (disp > 0)
        return np.where(valid, baseline_fx / np.where(disp > 0, disp, 1.0),
                        -1.0), valid
    depth = np.empty(png.shape, np.float32)
    valid = np.empty(png.shape, np.uint8)
    lib.pf_disparity_to_depth_u16(png.ctypes.data_as(ctypes.c_void_p),
                                  png.size, float(baseline_fx),
                                  depth.ctypes.data_as(ctypes.c_void_p),
                                  valid.ctypes.data_as(ctypes.c_void_p))
    return depth, valid.astype(bool)


def resize_nearest_u8(arr: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """PIL-NEAREST-compatible label-map resize."""
    lib = _load()
    arr = np.ascontiguousarray(arr, np.uint8)
    if lib is None:
        from PIL import Image

        return np.array(
            Image.fromarray(arr).resize((dw, dh), Image.NEAREST)
        )
    out = np.empty((dh, dw), np.uint8)
    lib.pf_resize_nearest_u8(arr.ctypes.data_as(ctypes.c_void_p),
                             arr.shape[0], arr.shape[1],
                             out.ctypes.data_as(ctypes.c_void_p), dh, dw)
    return out
