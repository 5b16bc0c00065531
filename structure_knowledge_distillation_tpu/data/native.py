"""ctypes bindings for the native (C++) host data-path kernels.

Builds `native/libskd_native.so` on first use (g++ is in the image; no
pybind11 needed — plain C ABI + ctypes). Falls back to the numpy path when
compilation is unavailable. See native/augment.cpp for semantics.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["get_native_lib", "native_augment", "native_confusion"]

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libskd_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _is_stale() -> bool:
    src = os.path.join(_NATIVE_DIR, "augment.cpp")
    return (os.path.exists(_LIB_PATH) and os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))


def _build() -> bool:
    """Run make under a cross-PROCESS file lock.

    Spawned loader workers all hit get_native_lib on their first sample; a
    stale/missing .so would otherwise launch N concurrent `make`s rewriting
    the same output while siblings dlopen it. The flock serializes builders
    across processes (the threading lock in get_native_lib only covers this
    process); the post-acquire freshness re-check makes every waiter a
    no-op once the first builder finishes. The Makefile writes via a temp
    file + atomic rename, so processes holding the OLD library mapped keep
    a consistent (old-inode) image."""
    try:
        import fcntl

        os.makedirs(_NATIVE_DIR, exist_ok=True)
        with open(os.path.join(_NATIVE_DIR, ".build.lock"), "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            if os.path.exists(_LIB_PATH) and not _is_stale():
                return True  # another process already built it
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception as e:  # pragma: no cover
        log.warning("native build failed (%s); using numpy fallback", e)
        return False


def get_native_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        stale = _is_stale()
        if (not os.path.exists(_LIB_PATH) or stale) and not _build():
            if stale:  # keep running with the older .so rather than dying
                log.warning("native rebuild failed; using the stale library")
            else:
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.skd_augment.argtypes = [
            u8p, u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, u8p, ctypes.c_int, f32p, i32p,
        ]
        lib.skd_augment.restype = None
        lib.skd_confusion.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, i64p,
        ]
        lib.skd_confusion.restype = None
        _lib = lib
        return _lib


def _ptr(arr: Optional[np.ndarray], ctype):
    if arr is None:
        return ctypes.cast(None, ctypes.POINTER(ctype))
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def native_augment(
    img: np.ndarray,
    label: Optional[np.ndarray],
    f_scale: float,
    crop: tuple,
    h_off: int,
    w_off: int,
    flip: bool,
    mean: np.ndarray,
    lut: Optional[np.ndarray],
    ignore_label: int = 255,
):
    """One-pass scale+LUT+mean-subtract+pad+crop+flip. Returns (image f32 HWC,
    label i32 HW or None). Raises RuntimeError if the native lib is missing."""
    lib = get_native_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    if label is not None:
        label = np.ascontiguousarray(label, np.uint8)
    crop_h, crop_w = crop
    out_img = np.empty((crop_h, crop_w, 3), np.float32)
    out_label = np.empty((crop_h, crop_w), np.int32) if label is not None else None
    mean = np.ascontiguousarray(mean, np.float32)
    if lut is not None:
        lut = np.ascontiguousarray(lut, np.uint8)
    lib.skd_augment(
        _ptr(img, ctypes.c_uint8), _ptr(label, ctypes.c_uint8),
        img.shape[0], img.shape[1],
        float(f_scale), crop_h, crop_w, int(h_off), int(w_off), int(flip),
        _ptr(mean, ctypes.c_float), _ptr(lut, ctypes.c_uint8),
        int(ignore_label),
        _ptr(out_img, ctypes.c_float), _ptr(out_label, ctypes.c_int32),
    )
    return out_img, out_label


def native_confusion(pred: np.ndarray, gt: np.ndarray, num_classes: int,
                     ignore_label: int = 255) -> np.ndarray:
    lib = get_native_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pred = np.ascontiguousarray(pred.ravel(), np.int32)
    gt = np.ascontiguousarray(gt.ravel(), np.int32)
    conf = np.zeros((num_classes, num_classes), np.int64)
    lib.skd_confusion(
        _ptr(pred, ctypes.c_int32), _ptr(gt, ctypes.c_int32),
        np.int64(pred.size), num_classes, ignore_label,
        _ptr(conf, ctypes.c_int64),
    )
    return conf
