"""Visualization suite: mask / instance / panoptic / grounding overlays.

Role of /root/reference/utils/visualizer.py (the detectron2-style drawing
suite) + sam/utils/utils.py mask plotting: render predictions onto images
as numpy RGB arrays (no display dependency; PIL for text if available).
"""

from __future__ import annotations

import colorsys

import numpy as np


def _palette(n: int, seed: int = 37) -> np.ndarray:
    rs = np.random.RandomState(seed)
    colors = []
    for i in range(n):
        h = (i * 0.61803398875) % 1.0
        s = 0.55 + 0.4 * rs.rand()
        v = 0.75 + 0.25 * rs.rand()
        colors.append(tuple(int(255 * c) for c in colorsys.hsv_to_rgb(h, s, v)))
    return np.asarray(colors, np.uint8)


def overlay_mask(
    image: np.ndarray, mask: np.ndarray, color=(30, 144, 255), alpha=0.55,
    outline: bool = True,
) -> np.ndarray:
    """Blend one binary mask onto an RGB uint8 image."""
    out = np.asarray(image, np.float32).copy()
    m = np.asarray(mask, bool)
    out[m] = out[m] * (1 - alpha) + np.asarray(color, np.float32) * alpha
    if outline:
        edge = m ^ _erode(m)
        out[edge] = color
    return out.astype(np.uint8)


def _erode(mask: np.ndarray) -> np.ndarray:
    p = np.pad(mask, 1, constant_values=False)
    out = mask.copy()
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out &= p[dy : dy + mask.shape[0], dx : dx + mask.shape[1]]
    return out


def draw_instances(
    image: np.ndarray, masks: np.ndarray, labels=None, scores=None,
    class_names=None, alpha=0.5,
) -> np.ndarray:
    """Render instance masks (N, H, W) with per-instance colors."""
    out = np.asarray(image, np.uint8).copy()
    colors = _palette(max(len(masks), 1))
    for i, m in enumerate(masks):
        out = overlay_mask(out, m, color=tuple(int(c) for c in colors[i]), alpha=alpha)
    return out


def draw_sem_seg(
    image: np.ndarray, sem_seg: np.ndarray, num_classes: int | None = None,
    alpha=0.5,
) -> np.ndarray:
    """Render a semantic argmax map (H, W) int."""
    sem_seg = np.asarray(sem_seg)
    k = int(num_classes or (sem_seg.max() + 1))
    colors = _palette(max(k, 1))
    overlay = colors[np.clip(sem_seg, 0, k - 1)]
    out = np.asarray(image, np.float32) * (1 - alpha) + overlay.astype(np.float32) * alpha
    return out.astype(np.uint8)


def draw_panoptic(
    image: np.ndarray, panoptic_seg: np.ndarray, segments_info: list[dict],
    alpha=0.5,
) -> np.ndarray:
    """Render a panoptic id map + segments."""
    out = np.asarray(image, np.uint8).copy()
    colors = _palette(len(segments_info) + 1)
    for seg in segments_info:
        out = overlay_mask(
            out, panoptic_seg == seg["id"],
            color=tuple(int(c) for c in colors[seg["id"] % len(colors)]),
            alpha=alpha,
        )
    return out


def draw_boxes(image: np.ndarray, boxes: np.ndarray, color=(255, 60, 60),
               thickness: int = 2) -> np.ndarray:
    """Draw xyxy boxes."""
    out = np.asarray(image, np.uint8).copy()
    h, w = out.shape[:2]
    for b in np.asarray(boxes, int):
        x0, y0, x1, y1 = np.clip(b, 0, [w - 1, h - 1, w - 1, h - 1])
        for t in range(thickness):
            out[np.clip(y0 + t, 0, h - 1), x0:x1] = color
            out[np.clip(y1 - t, 0, h - 1), x0:x1] = color
            out[y0:y1, np.clip(x0 + t, 0, w - 1)] = color
            out[y0:y1, np.clip(x1 - t, 0, w - 1)] = color
    return out


def draw_points(image: np.ndarray, points: np.ndarray, labels=None,
                radius: int = 4) -> np.ndarray:
    """Draw click points (green positive / red negative)."""
    out = np.asarray(image, np.uint8).copy()
    h, w = out.shape[:2]
    pts = np.asarray(points)
    labs = np.ones(len(pts)) if labels is None else np.asarray(labels)
    yy, xx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    disk = (yy ** 2 + xx ** 2) <= radius ** 2
    for (x, y), lab in zip(pts.astype(int), labs):
        color = (0, 220, 60) if lab > 0 else (230, 40, 40)
        ys = np.clip(y + yy[disk], 0, h - 1)
        xs = np.clip(x + xx[disk], 0, w - 1)
        out[ys, xs] = color
    return out


def iou_curve_png(ious: np.ndarray, path: str):
    """IoU-vs-clicks curve PNG (reference interactive_evaluation.py:87-113)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ious = np.asarray(ious)
    fig, ax = plt.subplots(figsize=(5, 4))
    # (N samples, C clicks) -> per-click mean over samples.
    mean = ious.mean(0) if ious.ndim == 2 else ious
    ax.plot(np.arange(1, len(mean) + 1), mean, marker="o")
    ax.set_xlabel("clicks")
    ax.set_ylabel("mIoU")
    ax.set_ylim(0, 1)
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
