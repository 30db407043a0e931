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
        return _lib if _lib is not False else None
    if not os.path.exists(_LIB_PATH):
        _lib = False  # cache the miss: no per-call exists/CDLL probes
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    try:
        lib.mask_nms_bits  # newest symbol: stale .so -> rebuild needed
    except AttributeError:
        import logging

        logging.getLogger(__name__).warning(
            "stale %s (missing symbols): native paths disabled — rebuild "
            "with `python -m iuvl_tpu.native.build`", _LIB_PATH,
        )
        _lib = False
        return None
    lib.resize_bilinear_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.resize_pad_normalize.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.mask_nms_bits.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_double, ctypes.c_void_p,
    ]
    lib.mask_nms_bits.restype = ctypes.c_int64
    lib.masks_to_rle_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
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


def mask_nms_bits(masks: np.ndarray, order: np.ndarray,
                  iou_thresh: float) -> np.ndarray | None:
    """Greedy mask NMS via packed-bitset popcount IoU. masks (N, H, W)
    bool-ish, order (N,) score-descending indices. Returns kept indices, or
    None when the native library isn't built (caller uses the numpy path).
    Bit packing order is irrelevant — only AND/popcount is computed."""
    lib = _load()
    if lib is None:
        return None
    n = len(masks)
    if n == 0:
        return np.zeros(0, np.int64)
    flat = masks.reshape(n, -1)
    if flat.dtype != bool and flat.dtype != np.uint8:
        flat = flat != 0
    packed = np.packbits(flat, axis=1)  # (n, ceil(hw/8)) uint8
    pad = (-packed.shape[1]) % 8
    if pad:
        packed = np.pad(packed, ((0, 0), (0, pad)))
    bits = np.ascontiguousarray(packed).view(np.uint64)
    order = np.ascontiguousarray(order, np.int64)
    kept = np.empty(n, np.int64)
    k = lib.mask_nms_bits(
        bits.ctypes.data, n, bits.shape[1], order.ctypes.data,
        float(iou_thresh), kept.ctypes.data,
    )
    return kept[:k].copy()


def masks_to_rle_batch(masks: np.ndarray, cap: int = 0) -> list[dict] | None:
    """Batched uncompressed COCO RLE (column-major). masks (N, H, W).
    Returns a list of {"size": [h, w], "counts": [...]} dicts, or None when
    the native library isn't built. Masks whose run count exceeds the cap
    fall back to the numpy encoder per mask."""
    lib = _load()
    if lib is None:
        return None
    n, h, w = masks.shape
    if n == 0:
        return []
    if cap <= 0:
        cap = max(1024, h * w // 16)
    if masks.dtype == bool:  # same memory layout; the cast copy is slow
        m = np.ascontiguousarray(masks).view(np.uint8)
    else:
        m = np.ascontiguousarray(masks, np.uint8)
    counts = np.empty((n, cap), np.int32)
    ncounts = np.empty(n, np.int64)
    lib.masks_to_rle_batch(
        m.ctypes.data, n, h, w, counts.ctypes.data, cap, ncounts.ctypes.data
    )
    out = []
    for i in range(n):
        if ncounts[i] < 0:  # cap overflow: numpy fallback for this mask
            from ..inference.amg import mask_to_rle

            out.append(mask_to_rle(masks[i]))
        else:
            out.append({"size": [h, w],
                        "counts": counts[i, : ncounts[i]].tolist()})
    return out
