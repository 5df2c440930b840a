"""ctypes bindings + lazy build of the native C++ augmentation engine
(csrc/augment.cpp). Falls back cleanly when no compiler is available —
callers check ``available()``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "csrc", "augment.cpp")
_BUILD_DIR = os.path.join(_ROOT, "csrc", "build")
_SO = os.path.join(_BUILD_DIR, "libaugment.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> Optional[ctypes.CDLL]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-march=native",
            _SRC, "-o", _SO,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.augment_train.argtypes = [
        _u8p, _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _f32p, _f32p, _f32p, _i32p,
    ]
    lib.eval_preprocess_full.argtypes = [
        _u8p, _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _f32p, _f32p, _f32p, _i32p,
    ]
    lib.encode_labels.argtypes = [_u8p, ctypes.c_int, _u8p, _u8p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is None and not _failed:
            try:
                _lib = _build()
            except Exception:
                _failed = True
    return _lib


def available() -> bool:
    return get_lib() is not None


def augment_train_native(
    img: np.ndarray,
    mask: np.ndarray,
    crop_size: Tuple[int, int],
    mean,
    std,
    scale: float,
    flip: bool,
    crop_i: int,
    crop_j: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fused scale+flip+normalize+pad+crop. img (h,w,3) uint8; mask (h,w)
    uint8. Geometry (scale/flip/crop offsets) is decided by the caller so
    randomness stays in Python (reproducible seeds)."""
    lib = get_lib()
    assert lib is not None
    h, w = img.shape[:2]
    out_img = np.empty((crop_size[0], crop_size[1], 3), np.float32)
    out_mask = np.empty(crop_size, np.int32)
    lib.augment_train(
        np.ascontiguousarray(img), np.ascontiguousarray(mask), h, w,
        ctypes.c_float(scale), int(flip), crop_i, crop_j,
        crop_size[0], crop_size[1],
        np.asarray(mean, np.float32), np.asarray(std, np.float32),
        out_img, out_mask,
    )
    return out_img, out_mask


def eval_full_native(img, mask, out_size, mean, std):
    lib = get_lib()
    assert lib is not None
    h, w = img.shape[:2]
    out_img = np.empty((out_size[0], out_size[1], 3), np.float32)
    out_mask = np.empty(out_size, np.int32)
    lib.eval_preprocess_full(
        np.ascontiguousarray(img), np.ascontiguousarray(mask), h, w,
        out_size[0], out_size[1],
        np.asarray(mean, np.float32), np.asarray(std, np.float32),
        out_img, out_mask,
    )
    return out_img, out_mask


def encode_labels_native(raw: np.ndarray, lut: np.ndarray) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    flat = np.ascontiguousarray(raw.reshape(-1))
    out = np.empty_like(flat)
    lib.encode_labels(flat, flat.size, np.ascontiguousarray(lut), out)
    return out.reshape(raw.shape)
