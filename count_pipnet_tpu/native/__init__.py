"""ctypes bindings for the native batch-assembly library.

Builds lazily with the system compiler on first use (no pybind11 in this
environment; plain C ABI + ctypes). Falls back transparently to numpy when
no compiler is available — callers use :func:`normalize_batch` /
:func:`stack_batch` and never need to know.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["normalize_batch", "stack_batch", "native_available"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "batch_ops.cpp")
_LIB_PATH = os.path.join(_HERE, "libbatch_ops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["c++", "-O3", "-march=native", "-shared", "-fPIC", "-o",
           _LIB_PATH, _SRC, "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH)
                    < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.normalize_batch_u8.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int]
            lib.stack_batch_f32.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_int,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int]
            _lib = lib
        except Exception as e:  # pragma: no cover
            print(f"(native batch ops unavailable, using numpy: {e})")
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def normalize_batch(images, mean, std, n_threads=4):
    """uint8 HWC image list -> normalized float32 NHWC batch."""
    lib = _load()
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    imgs = [np.ascontiguousarray(im, np.uint8) for im in images]
    n = len(imgs)
    h, w, _ = imgs[0].shape
    out = np.empty((n, h, w, 3), np.float32)
    if lib is None:
        np.divide(np.stack(imgs), 255.0, out=out)
        out -= mean
        out /= std
        return out
    ptrs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p) for im in imgs])
    lib.normalize_batch_u8(
        ptrs, n, h, w,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    return out


def stack_batch(images, n_threads=4):
    """float32 array list -> contiguous stacked batch (parallel memcpy)."""
    lib = _load()
    imgs = [np.ascontiguousarray(im, np.float32) for im in images]
    if lib is None:
        return np.stack(imgs)
    n = len(imgs)
    out = np.empty((n,) + imgs[0].shape, np.float32)
    elems = int(np.prod(imgs[0].shape))
    ptrs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p) for im in imgs])
    lib.stack_batch_f32(
        ptrs, n, elems,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    return out
