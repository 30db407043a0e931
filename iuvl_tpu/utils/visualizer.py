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


def class_color(class_id: int) -> tuple[int, int, int]:
    """Deterministic per-CLASS color (reference Visualizer uses metadata
    thing_colors/stuff_colors keyed by class; we derive a stable color from
    the class id so the same category always renders identically)."""
    return tuple(int(c) for c in _palette(class_id + 1)[class_id])


def _jitter(color, seed: int) -> tuple[int, int, int]:
    """Small per-instance hue jitter around the class color (reference
    Visualizer._jitter:1161-1173) so same-class instances stay separable."""
    rs = np.random.RandomState(seed)
    vec = rs.rand(3) - 0.5
    vec = vec / (np.linalg.norm(vec) + 1e-7) * 0.5 * 255
    return tuple(int(np.clip(c + d, 0, 255)) for c, d in zip(color, vec))


def create_text_labels(classes, scores=None, class_names=None):
    """Reference _create_text_labels:230-254: "name" or "name 97%"."""
    labels = None
    if classes is not None:
        if class_names is not None and len(class_names):
            labels = [class_names[int(i)] if 0 <= int(i) < len(class_names)
                      else str(int(i)) for i in classes]
        else:
            labels = [str(int(i)) for i in classes]
    if scores is not None:
        if labels is None:
            labels = ["{:.0f}%".format(s * 100) for s in scores]
        else:
            labels = ["{} {:.0f}%".format(l, s * 100)
                      for l, s in zip(labels, scores)]
    return labels


def _mask_text_anchor(mask: np.ndarray) -> tuple[int, int]:
    """Text position = median of the largest connected component
    (reference draw_instance_predictions / _PanopticPrediction place text
    at the biggest region's median point)."""
    from scipy import ndimage

    lab, n = ndimage.label(mask)
    if n == 0:
        return mask.shape[1] // 2, mask.shape[0] // 2
    sizes = ndimage.sum_labels(np.ones_like(lab), lab, index=np.arange(1, n + 1))
    ys, xs = np.nonzero(lab == (1 + int(np.argmax(sizes))))
    return int(np.median(xs)), int(np.median(ys))


def draw_text(image: np.ndarray, text: str, xy: tuple[int, int],
              color=(255, 255, 255), anchor_center: bool = True) -> np.ndarray:
    """Rasterize a label onto the image with a dark halo for contrast
    (reference draw_text:861-906 uses matplotlib text with a black path
    effect; PIL stroke_width gives the same legibility)."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(np.asarray(image, np.uint8))
    d = ImageDraw.Draw(img)
    x, y = xy
    kw = {"anchor": "mm"} if anchor_center else {}
    try:
        d.text((x, y), text, fill=tuple(color), stroke_width=2,
               stroke_fill=(0, 0, 0), **kw)
    except TypeError:  # very old PIL without anchor/stroke
        d.text((x, y), text, fill=tuple(color))
    return np.asarray(img)


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
    class_names=None, alpha=0.5, show_text: bool = True,
) -> np.ndarray:
    """Render instance masks (N, H, W) with class-deterministic colors
    (per-instance jitter) and "name score%" labels at each mask's largest
    component median — the reference draw_instance_predictions:384-446."""
    out = np.asarray(image, np.uint8).copy()
    masks = np.asarray(masks, bool)
    n = len(masks)
    if labels is not None:
        colors = [_jitter(class_color(int(c)), seed=i)
                  for i, c in enumerate(labels)]
    else:
        pal = _palette(max(n, 1))
        colors = [tuple(int(c) for c in pal[i]) for i in range(n)]
    # Draw big masks first so small instances stay visible (reference
    # overlay_instances sorts by area descending).
    order = np.argsort([-m.sum() for m in masks]) if n else []
    for i in order:
        out = overlay_mask(out, masks[i], color=colors[i], alpha=alpha)
    if show_text:
        texts = create_text_labels(labels, scores, class_names)
        for i in order:
            if texts is None or not masks[i].any():
                continue
            out = draw_text(out, texts[i], _mask_text_anchor(masks[i]))
    return out


def draw_sem_seg(
    image: np.ndarray, sem_seg: np.ndarray, num_classes: int | None = None,
    alpha=0.5, class_names=None, area_threshold: int = 0,
    show_text: bool = False,
) -> np.ndarray:
    """Render a semantic argmax map (H, W) int with class-deterministic
    colors; optional class-name text at each class region's median
    (reference draw_sem_seg:447-481)."""
    sem_seg = np.asarray(sem_seg)
    k = int(num_classes or (sem_seg.max() + 1))
    colors = np.stack([class_color(i) for i in range(max(k, 1))])
    overlay = colors[np.clip(sem_seg, 0, k - 1)]
    out = np.asarray(image, np.float32) * (1 - alpha) + overlay.astype(np.float32) * alpha
    out = out.astype(np.uint8)
    if show_text:
        for c in np.unique(sem_seg):
            m = sem_seg == c
            if m.sum() <= area_threshold:
                continue
            name = (class_names[int(c)] if class_names is not None
                    and 0 <= int(c) < len(class_names) else str(int(c)))
            out = draw_text(out, name, _mask_text_anchor(m))
    return out


def draw_panoptic(
    image: np.ndarray, panoptic_seg: np.ndarray, segments_info: list[dict],
    alpha=0.5, class_names=None, show_text: bool = True,
    area_threshold: int = 0,
) -> np.ndarray:
    """Render a panoptic id map + segments with class-deterministic colors
    and labels; thing segments get per-instance jitter and scores when
    present (reference draw_panoptic_seg:483-547)."""
    out = np.asarray(image, np.uint8).copy()
    texts = []
    for i, seg in enumerate(sorted(segments_info,
                                   key=lambda s: -(panoptic_seg == s["id"]).sum())):
        m = panoptic_seg == seg["id"]
        if m.sum() <= area_threshold:
            continue
        cid = int(seg.get("category_id", seg["id"]))
        color = class_color(cid)
        if seg.get("isthing"):
            color = _jitter(color, seed=int(seg["id"]))
        out = overlay_mask(out, m, color=color, alpha=alpha)
        if show_text:
            name = (class_names[cid] if class_names is not None
                    and 0 <= cid < len(class_names) else str(cid))
            if seg.get("score") is not None:
                name = "{} {:.0f}%".format(name, 100 * float(seg["score"]))
            texts.append((name, _mask_text_anchor(m)))
    for name, xy in texts:
        out = draw_text(out, name, xy)
    return out


def draw_boxes(image: np.ndarray, boxes: np.ndarray, color=(255, 60, 60),
               thickness: int = 2, labels=None, scores=None,
               class_names=None) -> np.ndarray:
    """Draw xyxy boxes with optional "name score%" text at the top-left
    corner (reference draw_box:908-940 + overlay_instances label path)."""
    out = np.asarray(image, np.uint8).copy()
    h, w = out.shape[:2]
    for b in np.asarray(boxes, int):
        x0, y0, x1, y1 = np.clip(b, 0, [w - 1, h - 1, w - 1, h - 1])
        for t in range(thickness):
            out[np.clip(y0 + t, 0, h - 1), x0:x1] = color
            out[np.clip(y1 - t, 0, h - 1), x0:x1] = color
            out[y0:y1, np.clip(x0 + t, 0, w - 1)] = color
            out[y0:y1, np.clip(x1 - t, 0, w - 1)] = color
    texts = create_text_labels(labels, scores, class_names)
    if texts is not None:
        for b, t in zip(np.asarray(boxes, int), texts):
            out = draw_text(out, t, (max(int(b[0]), 2), max(int(b[1]) - 6, 2)),
                            anchor_center=False)
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
