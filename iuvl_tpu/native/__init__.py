"""ctypes bindings for the native preprocessing core (preprocess.cpp).

Build: ``python -m iuvl_tpu.native.build`` (g++ -O3 -fopenmp). All entry
points degrade gracefully to numpy when the library isn't built, so the
framework stays pure-python runnable.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libiuvl_preprocess.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.resize_bilinear_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.resize_pad_normalize.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.native_num_threads.restype = ctypes.c_int64
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def resize_bilinear(image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """uint8 HWC resize via the native core (numpy fallback otherwise)."""
    lib = _load()
    image = np.ascontiguousarray(image, np.uint8)
    h, w, c = image.shape
    if lib is None:
        from ..data.transforms import resize_longest_side  # numpy path

        # generic fallback: direct numpy bilinear
        ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
        xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
        y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        fy = np.clip(ys - y0, 0, 1)[:, None, None]
        fx = np.clip(xs - x0, 0, 1)[None, :, None]
        img = image.astype(np.float32)
        top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
        bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
        return (top * (1 - fy) + bot * fy + 0.5).astype(np.uint8)
    out = np.empty((out_h, out_w, c), np.uint8)
    lib.resize_bilinear_u8(
        image.ctypes.data, h, w, c, out.ctypes.data, out_h, out_w
    )
    return out


def resize_pad_normalize(
    image: np.ndarray, size: int, mean, std
) -> np.ndarray:
    """uint8 HWC -> normalized float32 (size, size, C), longest side fit."""
    lib = _load()
    image = np.ascontiguousarray(image, np.uint8)
    h, w, c = image.shape
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    if lib is None:
        from ..data.transforms import pad_to_square, resize_longest_side

        resized = resize_longest_side(image, size)
        padded = pad_to_square(resized, size).astype(np.float32)
        return (padded - mean) / std
    out = np.empty((size, size, c), np.float32)
    scratch = np.empty(size * size * c, np.uint8)
    lib.resize_pad_normalize(
        image.ctypes.data, h, w, c, out.ctypes.data, size,
        mean.ctypes.data, std.ctypes.data, scratch.ctypes.data,
    )
    return out
