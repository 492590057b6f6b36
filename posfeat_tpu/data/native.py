"""ctypes bindings for the native host-preprocessing library
(native/preproc.cpp). Compiled on first use with g++; every entry point
has a numpy fallback, so the pipeline works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from .utils import IMAGENET_MEAN, IMAGENET_STD

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "preproc.cpp")
_LIB_DIR = os.path.join(_REPO_ROOT, ".build")
_LIB = os.path.join(_LIB_DIR, "libpreproc.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
                _SRC
            ):
                os.makedirs(_LIB_DIR, exist_ok=True)
                subprocess.check_call(
                    [
                        "g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-o", _LIB, _SRC, "-lpthread",
                    ]
                )
            lib = ctypes.CDLL(_LIB)
            lib.normalize_crop.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
            lib.normalize_crop.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


_MEAN = IMAGENET_MEAN.astype(np.float32)
_STD = IMAGENET_STD.astype(np.float32)
_MEAN_P = _MEAN.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
_STD_P = _STD.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def native_available() -> bool:
    return _load() is not None


def normalize_crop16(im: np.ndarray, n_threads: int = 4) -> np.ndarray:
    """uint8 HWC RGB -> %16-cropped ImageNet-normalized f32, one pass."""
    h, w = im.shape[:2]
    out_h, out_w = h - h % 16, w - w % 16
    lib = _load()
    if lib is None:  # numpy fallback
        x = im[:out_h, :out_w].astype(np.float32) / 255.0
        return (x - _MEAN) / _STD
    im = np.ascontiguousarray(im)
    out = np.empty((out_h, out_w, 3), np.float32)
    lib.normalize_crop(
        im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, out_h, out_w,
        _MEAN_P, _STD_P,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return out
