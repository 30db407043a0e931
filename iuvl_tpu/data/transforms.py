"""Image preprocessing.

Parity target: /root/reference/sam/utils/transforms.py (ResizeLongestSide)
+ the 1024-pad batching done by detectron2 ImageList in the reference
(xdecoder_model.py:699-701): resize so the longest side equals ``target``,
then zero-pad bottom/right to (target, target).

Host path (``resize_longest_side``) handles ragged input sizes per image in
numpy; the jitted path (``preprocess_batch``) normalizes + pads fixed-shape
batches on device.
"""

from __future__ import annotations

import numpy as np

try:  # PIL is available via torchvision deps; fall back to numpy bilinear.
    from PIL import Image

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def get_preprocess_shape(h: int, w: int, long_side: int) -> tuple[int, int]:
    """Output (new_h, new_w) with the longest side == long_side
    (reference transforms.py:97-102)."""
    scale = long_side / max(h, w)
    new_h, new_w = h * scale, w * scale
    return int(new_h + 0.5), int(new_w + 0.5)


def resize_longest_side(image: np.ndarray, long_side: int = 1024) -> np.ndarray:
    """(H, W, 3) uint8 -> resized (h', w', 3), bilinear.

    Path order: native C++/OpenMP core (iuvl_tpu/native, the loader's hot
    half — multi-threaded, no GIL) -> PIL -> numpy."""
    h, w = image.shape[:2]
    new_h, new_w = get_preprocess_shape(h, w, long_side)
    if image.dtype == np.uint8 and image.ndim == 3:
        from .. import native

        if native.available():
            return native.resize_bilinear(image, new_h, new_w)
    if _HAS_PIL:
        pil = Image.fromarray(image.astype(np.uint8))
        return np.asarray(pil.resize((new_w, new_h), Image.BILINEAR))
    ys = (np.arange(new_h) + 0.5) * h / new_h - 0.5
    xs = (np.arange(new_w) + 0.5) * w / new_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None, None]
    fx = np.clip(xs - x0, 0, 1)[None, :, None]
    img = image.astype(np.float32)
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    return (top * (1 - fy) + bot * fy).astype(image.dtype)


def pad_to_square(image: np.ndarray, size: int = 1024) -> np.ndarray:
    """Zero-pad bottom/right to (size, size, C)."""
    h, w = image.shape[:2]
    out = np.zeros((size, size, image.shape[2]), image.dtype)
    out[:h, :w] = image
    return out


def apply_coords(coords: np.ndarray, orig_hw: tuple[int, int], long_side: int = 1024):
    """Map xy pixel coords from the original image into the resized frame
    (reference transforms.py:40-49)."""
    h, w = orig_hw
    new_h, new_w = get_preprocess_shape(h, w, long_side)
    out = np.asarray(coords, np.float32).copy()
    out[..., 0] *= new_w / w
    out[..., 1] *= new_h / h
    return out


def apply_boxes(boxes: np.ndarray, orig_hw: tuple[int, int], long_side: int = 1024):
    """xyxy boxes through the same mapping (reference transforms.py:51-57)."""
    return apply_coords(
        np.asarray(boxes, np.float32).reshape(-1, 2, 2), orig_hw, long_side
    ).reshape(-1, 4)
