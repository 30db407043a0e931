"""Automatic mask generation (SAM 'segment everything').

Parity target: /root/reference/sam/utils/amg.py — point grids
(build_all_layer_point_grids :189, the only function the reference model
imports), stability score, and the AMG pipeline pieces (batched point-grid
decode, quality filtering, mask NMS). The batched decode runs as jitted
prompt batches from a cached embedding (one-encode/many-decode); filtering
and NMS are small host-side numpy passes.
"""

from __future__ import annotations

import numpy as np


def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n^2, 2) normalized [0,1] xy grid at cell centers
    (reference amg.py build_point_grid)."""
    offset = 1.0 / (2 * n_per_side)
    pts = np.linspace(offset, 1.0 - offset, n_per_side)
    gx, gy = np.meshgrid(pts, pts)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], -1)


def build_all_layer_point_grids(
    n_per_side: int, n_layers: int, scale_per_layer: int
) -> list[np.ndarray]:
    """Reference amg.py:189: one grid per crop layer, scaled down per layer."""
    return [
        build_point_grid(int(n_per_side / (scale_per_layer ** i)))
        for i in range(n_layers + 1)
    ]


def stability_score(mask_logits: np.ndarray, threshold_offset: float = 1.0) -> np.ndarray:
    """IoU between masks thresholded at +-offset around 0
    (reference amg.py calculate_stability_score). mask_logits (N, H, W)."""
    hi = (mask_logits > threshold_offset).reshape(len(mask_logits), -1).sum(-1)
    lo = (mask_logits > -threshold_offset).reshape(len(mask_logits), -1).sum(-1)
    return hi / np.maximum(lo, 1)


def mask_to_rle(mask: np.ndarray) -> dict:
    """Uncompressed COCO RLE (column-major, like pycocotools / reference
    amg.py mask_to_rle_pytorch)."""
    h, w = mask.shape
    flat = np.asarray(mask, bool).T.reshape(-1)  # fortran order
    # run lengths, starting with a 0-run (count of leading zeros)
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    idx = np.concatenate([[0], change, [len(flat)]])
    counts = np.diff(idx).tolist()
    if flat[0]:
        counts = [0] + counts
    return {"size": [h, w], "counts": counts}


def rle_to_mask(rle: dict) -> np.ndarray:
    """Inverse of mask_to_rle (vectorized: runs alternate 0/1)."""
    h, w = rle["size"]
    counts = np.asarray(rle["counts"], np.int64)
    vals = np.zeros(len(counts), bool)
    vals[1::2] = True
    flat = np.repeat(vals, counts)
    return flat.reshape(w, h).T


def coco_encode_rle(rle: dict) -> dict:
    """Compressed COCO RLE string (reference amg.py:294 coco_encode_rle via
    pycocotools; that C codec isn't available here, so this reimplements
    the public format: per-count delta vs two back, LEB128-style 5-bit
    groups with a continuation bit, chars offset by 48)."""
    counts = rle["counts"]
    out = []
    for i, c in enumerate(counts):
        x = int(c) - (int(counts[i - 2]) if i > 2 else 0)
        more = True
        while more:
            c5 = x & 0x1F
            x >>= 5
            more = (x != -1) if (c5 & 0x10) else (x != 0)
            if more:
                c5 |= 0x20
            out.append(chr(c5 + 48))
    return {"size": list(rle["size"]), "counts": "".join(out)}


def coco_decode_rle(rle: dict) -> dict:
    """Inverse of coco_encode_rle -> uncompressed counts."""
    s = rle["counts"]
    counts: list[int] = []
    p = 0
    while p < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return {"size": list(rle["size"]), "counts": counts}


def area_from_rle(rle: dict) -> int:
    """Mask area from uncompressed RLE (reference amg.py:152)."""
    return int(sum(rle["counts"][1::2]))


def batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """XYXY boxes around (N, H, W) bool masks (reference amg.py:303-338
    batched_mask_to_box semantics: inclusive max-index edges, zeros for
    empty masks — a 1-pixel mask has x0 == x1)."""
    n = len(masks)
    boxes = np.zeros((n, 4), np.float32)
    if n == 0:
        return boxes
    rows = masks.any(2)  # (N, H)
    cols = masks.any(1)  # (N, W)
    nonempty = rows.any(1)
    h, w = masks.shape[1:]
    y0 = rows.argmax(1)
    y1 = h - 1 - rows[:, ::-1].argmax(1)
    x0 = cols.argmax(1)
    x1 = w - 1 - cols[:, ::-1].argmax(1)
    boxes[nonempty] = np.stack(
        [x0, y0, x1, y1], -1
    )[nonempty].astype(np.float32)
    return boxes


def box_xyxy_to_xywh(box):
    x0, y0, x1, y1 = box
    return [float(x0), float(y0), float(x1 - x0), float(y1 - y0)]


def masks_to_rles(masks: np.ndarray) -> list[dict]:
    """Batched mask_to_rle: OpenMP C++ core when built
    (iuvl_tpu/native, ≙ the reference's pycocotools C codec), numpy
    per-mask otherwise."""
    from .. import native

    out = native.masks_to_rle_batch(masks)
    if out is not None:
        return out
    return [mask_to_rle(m) for m in masks]


def generate_crop_boxes(
    im_size: tuple[int, int], n_layers: int, overlap_ratio: float = 512 / 1500
):
    """Multi-layer crop boxes for AMG (reference amg.py generate_crop_boxes):
    layer 0 = full image; layer i has (2^i)^2 overlapping crops.
    Returns (boxes xyxy, layer indices)."""
    h, w = im_size
    boxes = [[0, 0, w, h]]
    layers = [0]
    short = min(h, w)
    for layer in range(1, n_layers + 1):
        n = 2 ** layer
        overlap = int(overlap_ratio * short * (2 / n))
        cw = int(math_ceil((overlap * (n - 1) + w) / n))
        ch = int(math_ceil((overlap * (n - 1) + h) / n))
        xs = [int((cw - overlap) * i) for i in range(n)]
        ys = [int((ch - overlap) * i) for i in range(n)]
        for y0 in ys:
            for x0 in xs:
                boxes.append([x0, y0, min(x0 + cw, w), min(y0 + ch, h)])
                layers.append(layer)
    return boxes, layers


def math_ceil(x: float) -> int:
    import math

    return math.ceil(x)


def mask_nms(masks: np.ndarray, scores: np.ndarray, iou_thresh: float = 0.7):
    """Greedy mask NMS by score. masks (N, H, W) bool. Returns kept indices.

    Fast path: packed-bitset popcount IoU in the native C++/OpenMP core —
    the numpy path streams the (N, HW) float64 matrix once per kept mask
    (~100 GB of traffic at N=1000, 256² masks), the bitset path reads
    64 pixels per word. Both paths consume the same order array, so the
    kept set is identical."""
    order = np.argsort(-scores)
    from .. import native

    kept_native = native.mask_nms_bits(masks, order, iou_thresh)
    if kept_native is not None:
        return kept_native
    flat = masks.reshape(len(masks), -1).astype(np.float64)
    areas = flat.sum(-1)
    kept: list[int] = []
    suppressed = np.zeros(len(masks), bool)
    for i in order:
        if suppressed[i] or areas[i] == 0:
            continue
        kept.append(int(i))
        inter = flat[i] @ flat.T
        union = areas[i] + areas - inter
        iou = inter / np.maximum(union, 1)
        suppressed |= iou > iou_thresh
        suppressed[i] = True
    return np.asarray(kept, np.int64)


def _decode_grid(model, params, image, grid, batch, pred_iou_thresh,
                 stability_thresh):
    """Encode one (1, S, S, 3) image, decode the point grid in prompt
    batches, filter by predicted IoU + stability. Returns (logits, scores)
    with logits at S/4 resolution."""
    import jax.numpy as jnp

    # Sam exposes decode_from_embedding (raw encode_image: caller
    # normalizes); SysLearner exposes decode_prompts (encode_image
    # normalizes internally). Same prompt-decode contract.
    decode_m = getattr(type(model), "decode_prompts", None)
    if decode_m is None:
        decode_m = type(model).decode_from_embedding
        image = model.apply(params, image, method=type(model).normalize)
    sam_emb, _ = model.apply(params, image, method=type(model).encode_image)
    all_logits, all_iou = [], []
    for start in range(0, len(grid), batch):
        chunk = grid[start : start + batch]
        pts = np.zeros((batch, 1, 2), np.float32)
        pts[: len(chunk), 0] = chunk
        out = model.apply(
            params, sam_emb, points=jnp.asarray(pts),
            labels=jnp.ones((batch, 1), jnp.int32),
            method=decode_m,
        )
        all_logits.append(np.asarray(out["masks"][: len(chunk), 0]))
        all_iou.append(np.asarray(out["iou_pred"][: len(chunk), 0]))
    logits = np.concatenate(all_logits)
    iou_pred = np.concatenate(all_iou)

    stab = stability_score(logits)
    keep = (iou_pred > pred_iou_thresh) & (stab > stability_thresh)
    return logits[keep], iou_pred[keep], stab[keep], np.asarray(grid)[keep]


def generate_masks(
    model, params, image, points_per_side: int = 32, batch: int = 64,
    pred_iou_thresh: float = 0.88, stability_thresh: float = 0.95,
    nms_thresh: float = 0.7, crop_n_layers: int = 0,
    crop_overlap_ratio: float = 512 / 1500, output_mode: str = "binary_mask",
):
    """Full AMG over one image (reference sam/utils/amg.py +
    SamAutomaticMaskGenerator): encode once per crop, decode the per-layer
    point grid in prompt batches, filter by predicted IoU + stability, NMS
    across all crops. ``crop_n_layers`` > 0 adds zoomed-in crop layers
    (layer i: (2^i)^2 overlapping crops, per-layer downscaled grids) whose
    masks are up-pasted into full-image space before the global NMS.
    Returns dict(masks (K, S/4, S/4) bool, scores (K,));
    ``output_mode`` "uncompressed_rle" / "coco_rle" (reference
    SamAutomaticMaskGenerator output modes) adds per-mask COCO RLE records
    under "rles" via the batched native codec (compressed-string form for
    coco_rle)."""
    assert output_mode in ("binary_mask", "uncompressed_rle", "coco_rle"), (
        output_mode
    )
    s = image.shape[1]
    ms = s // 4  # SAM mask logits resolution
    grids = build_all_layer_point_grids(points_per_side, crop_n_layers, 2)
    crop_boxes, layer_idxs = generate_crop_boxes(
        (s, s), crop_n_layers, crop_overlap_ratio
    )

    masks_all, scores_all = [], []
    stab_all, points_all, cropbox_all = [], [], []
    for box, layer in zip(crop_boxes, layer_idxs):
        x0, y0, x1, y1 = box
        cw, ch = x1 - x0, y1 - y0
        grid = grids[layer] * np.asarray([s, s])  # points in CROP-resized space
        if layer == 0:
            crop_img = image
        else:
            # Crop then resize back to the model's square input.
            from ..data.transforms import resize_longest_side

            crop_np = np.asarray(image[0, y0:y1, x0:x1]).astype(np.uint8)
            crop_img = resize_longest_side(crop_np, s)[None].astype(np.float32)
            if crop_img.shape[1:3] != (s, s):
                padded = np.zeros((1, s, s, 3), np.float32)
                padded[0, : crop_img.shape[1], : crop_img.shape[2]] = crop_img[0]
                crop_img = padded
        logits, scores, stab, kept_pts = _decode_grid(
            model, params, crop_img, grid, batch, pred_iou_thresh,
            stability_thresh,
        )
        if len(logits) == 0:
            continue
        # Grid points back to full-image space: the crop (ch, cw) was
        # resized longest-side to s, so divide by that scale and offset.
        scale = s / max(ch, cw) if layer > 0 else 1.0
        points_all.append(kept_pts / scale + np.asarray([x0, y0]))
        cropbox_all.append(np.tile(np.asarray(box, np.float32),
                                   (len(logits), 1)))
        stab_all.append(stab)
        m = logits > 0
        if layer > 0:
            # Un-crop: resize crop masks to the crop's footprint at the
            # mask resolution and paste into the full-image canvas.
            mh = max(1, round(ch / 4))
            mw = max(1, round(cw / 4))
            ys = np.clip((np.arange(mh) * m.shape[1] / mh).astype(int),
                         0, m.shape[1] - 1)
            xs = np.clip((np.arange(mw) * m.shape[2] / mw).astype(int),
                         0, m.shape[2] - 1)
            resized = m[:, ys][:, :, xs]
            canvas = np.zeros((len(m), ms, ms), bool)
            oy, ox = y0 // 4, x0 // 4
            canvas[:, oy : oy + mh, ox : ox + mw] = resized[
                :, : ms - oy, : ms - ox
            ]
            m = canvas
        masks_all.append(m)
        scores_all.append(scores)

    if not masks_all:
        empty = np.zeros((0, ms, ms), bool)
        out = {"masks": empty, "scores": np.zeros(0, np.float32),
               "records": []}
        if output_mode in ("uncompressed_rle", "coco_rle"):
            out["rles"] = []
        return out
    masks = np.concatenate(masks_all)
    scores = np.concatenate(scores_all)
    kept = mask_nms(masks, scores, nms_thresh)
    out = {"masks": masks[kept], "scores": scores[kept]}
    rles = None
    if output_mode == "uncompressed_rle":
        rles = masks_to_rles(out["masks"])
    elif output_mode == "coco_rle":
        rles = [coco_encode_rle(r) for r in masks_to_rles(out["masks"])]
    if rles is not None:
        out["rles"] = rles
    # Per-mask records in the reference SamAutomaticMaskGenerator.generate
    # layout (amg.py: segmentation/area/bbox/predicted_iou/point_coords/
    # stability_score/crop_box). ALL geometry is in the segmentation's own
    # (S/4) frame so records are self-consistent (the reference's records
    # are likewise single-frame; its masks live at full image resolution,
    # ours at S/4 — multiply every geometric field by 4 for image pixels).
    stabs = np.concatenate(stab_all)[kept]
    points = np.concatenate(points_all)[kept] / 4.0
    cboxes = np.concatenate(cropbox_all)[kept] / 4.0
    boxes = batched_mask_to_box(out["masks"])
    out["records"] = [
        {
            "segmentation": rles[i] if rles is not None else out["masks"][i],
            "area": int(out["masks"][i].sum()),
            "bbox": box_xyxy_to_xywh(boxes[i]),
            "predicted_iou": float(out["scores"][i]),
            "point_coords": [points[i].tolist()],
            "stability_score": float(stabs[i]),
            "crop_box": box_xyxy_to_xywh(cboxes[i]),
        }
        for i in range(len(kept))
    ]
    return out
