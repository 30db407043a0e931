"""Box ops (jittable).

Parity target: /root/reference/modeling/utils/box_ops.py — cxcywh/xyxy
conversions, IoU and generalized IoU (used by the bbox loss branch and
box postprocessing), plus masks -> boxes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jax.Array) -> jax.Array:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b: jax.Array) -> jax.Array:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: jax.Array) -> jax.Array:
    return jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)


def box_iou(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """a (N, 4), b (M, 4) xyxy -> (iou (N, M), union (N, M))."""
    area_a = box_area(a)[:, None]
    area_b = box_area(b)[None, :]
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, 1e-6), union


def generalized_box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """GIoU (N, M) (reference box_ops.generalized_box_iou)."""
    iou, union = box_iou(a, b)
    lt = jnp.minimum(a[:, None, :2], b[None, :, :2])
    rb = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, 1e-6)


def masks_to_boxes(masks: jax.Array) -> jax.Array:
    """(N, H, W) binary -> (N, 4) xyxy (0s for empty masks)."""
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    m = masks.astype(jnp.float32)
    any_mask = m.sum((-2, -1)) > 0
    big = 1e9
    x0 = jnp.where(m > 0, xs, big).min((-2, -1))
    y0 = jnp.where(m > 0, ys, big).min((-2, -1))
    x1 = jnp.where(m > 0, xs, -big).max((-2, -1))
    y1 = jnp.where(m > 0, ys, -big).max((-2, -1))
    boxes = jnp.stack([x0, y0, x1 + 1, y1 + 1], axis=-1)
    return jnp.where(any_mask[:, None], boxes, 0.0)
