"""Training augmentations: large-scale jitter (LSJ) + horizontal flip.

Parity target: the reference COCO train mapper's LSJ pipeline
(dataset_mappers/coco_panoptic_interactive_dataset_mapper.py:175-329 with
configs COCO.INPUT: IMAGE_SIZE 1024, MIN_SCALE 0.1, MAX_SCALE 2.0,
RANDOM_FLIP horizontal): random scale in [min, max] of the target size,
resize, random crop/pad to (size, size), applied identically to image and
masks. Host-side numpy (runs in the data loader)."""

from __future__ import annotations

import numpy as np

from .transforms import resize_longest_side


def large_scale_jitter(
    image: np.ndarray,  # (H, W, 3) uint8/float
    masks: np.ndarray,  # (N, H, W) bool/float
    rng: np.random.RandomState,
    image_size: int = 1024,
    min_scale: float = 0.1,
    max_scale: float = 2.0,
    flip_prob: float = 0.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (image (S, S, 3) float32, masks (N, S, S) float32)."""
    h, w = image.shape[:2]
    if rng.rand() < flip_prob:
        image = image[:, ::-1]
        masks = masks[:, :, ::-1]

    scale = rng.uniform(min_scale, max_scale)
    target = scale * image_size
    ratio = min(target / h, target / w)
    nh, nw = max(1, int(h * ratio + 0.5)), max(1, int(w * ratio + 0.5))

    img_r = _resize(image, nh, nw)
    masks_r = np.stack(
        [_resize(m[..., None].astype(np.float32), nh, nw)[..., 0] for m in masks]
    ) if len(masks) else np.zeros((0, nh, nw), np.float32)

    # Random crop (if larger) or pad (if smaller) to (image_size, image_size).
    out_img = np.zeros((image_size, image_size, image.shape[2]), np.float32)
    out_masks = np.zeros((len(masks), image_size, image_size), np.float32)
    y_off = rng.randint(0, max(nh - image_size, 0) + 1)
    x_off = rng.randint(0, max(nw - image_size, 0) + 1)
    ch = min(nh, image_size)
    cw = min(nw, image_size)
    out_img[:ch, :cw] = img_r[y_off : y_off + ch, x_off : x_off + cw]
    if len(masks):
        out_masks[:, :ch, :cw] = masks_r[:, y_off : y_off + ch, x_off : x_off + cw]
    return out_img, (out_masks > 0.5).astype(np.float32)


def lsj_apply(
    image: np.ndarray,  # (H, W, 3)
    masks: np.ndarray,  # (N, H, W) bool — gt at ORIGINAL resolution
    rng: np.random.RandomState,
    image_size: int = 1024,
    mask_stride: int = 4,
    min_scale: float = 0.1,
    max_scale: float = 2.0,
    flip_prob: float = 0.5,
) -> tuple[np.ndarray, np.ndarray]:
    """LSJ with masks emitted directly at the model's mask stride: one
    nearest-neighbor gather per mask stack instead of N full-res bilinear
    resizes (the host-side hot path of the COCO step1 mapper; semantics per
    the reference ResizeScale+FixedSizeCrop pipeline).
    Returns (image (S, S, 3) float32, masks (N, S/stride, S/stride) float32).
    """
    h, w = image.shape[:2]
    if rng.rand() < flip_prob:
        image = image[:, ::-1]
        masks = masks[:, :, ::-1]

    scale = rng.uniform(min_scale, max_scale)
    target = scale * image_size
    ratio = min(target / h, target / w)
    nh, nw = max(1, int(h * ratio + 0.5)), max(1, int(w * ratio + 0.5))
    y_off = rng.randint(0, max(nh - image_size, 0) + 1)
    x_off = rng.randint(0, max(nw - image_size, 0) + 1)
    ch, cw = min(nh, image_size), min(nw, image_size)

    out_img = np.zeros((image_size, image_size, image.shape[2]), np.float32)
    img_r = _resize(image, nh, nw)
    out_img[:ch, :cw] = img_r[y_off : y_off + ch, x_off : x_off + cw]

    ms = image_size // mask_stride
    out_masks = np.zeros((len(masks), ms, ms), np.float32)
    if len(masks):
        # Output grid (canvas coords at stride centers) -> source pixel.
        ys = np.arange(ms) * mask_stride + mask_stride // 2
        xs = np.arange(ms) * mask_stride + mask_stride // 2
        vy = ys < ch
        vx = xs < cw
        sy = np.clip(((ys + y_off) * h / nh).astype(int), 0, h - 1)
        sx = np.clip(((xs + x_off) * w / nw).astype(int), 0, w - 1)
        gathered = masks[:, sy][:, :, sx].astype(np.float32)
        out_masks = gathered * vy[None, :, None] * vx[None, None, :]
    return out_img, out_masks


def _resize(image: np.ndarray, nh: int, nw: int) -> np.ndarray:
    h, w = image.shape[:2]
    ys = np.clip(((np.arange(nh) + 0.5) * h / nh - 0.5), 0, h - 1)
    xs = np.clip(((np.arange(nw) + 0.5) * w / nw - 0.5), 0, w - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    f = image.astype(np.float32)
    top = f[y0][:, x0] * (1 - fx) + f[y0][:, x1] * fx
    bot = f[y1][:, x0] * (1 - fx) + f[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy
