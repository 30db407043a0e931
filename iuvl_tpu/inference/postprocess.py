"""Inference heads + post-processing.

Parity targets: /root/reference/modeling/architectures/xdecoder_model.py
semantic_inference (:1021-1028), panoptic_inference (:1030-1085),
instance_inference (:1087-1133) and modeling/modules/postprocessing.py
sem_seg_postprocess (:99-122).

TPU split: semantic / instance heads are jittable (static top-k shapes);
the panoptic merge is inherently sequential host logic and runs in numpy on
the (small) per-image outputs, overlapping with device compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def semantic_inference(mask_cls: jax.Array, mask_pred: jax.Array, keep_sem_bgd=False):
    """(Q, K) logits x (Q, H, W) mask logits -> (K-1, H, W) probabilities."""
    probs = jax.nn.softmax(mask_cls, axis=-1)
    if not keep_sem_bgd:
        probs = probs[..., :-1]
    masks = jax.nn.sigmoid(mask_pred)
    return jnp.einsum("qc,qhw->chw", probs, masks)


def instance_inference(
    mask_cls: jax.Array,  # (Q, K) — K includes the background column
    mask_pred: jax.Array,  # (Q, H, W) logits at output resolution
    topk: int = 100,
    thing_mask: jax.Array | None = None,  # (K-1,) bool; True = thing class
):
    """Top-k (query, class) pairs -> per-instance masks/scores/labels.
    Returns dict of fixed-shape arrays (jittable)."""
    q, k = mask_cls.shape
    scores = jax.nn.softmax(mask_cls, axis=-1)[:, :-1]  # (Q, K-1)
    flat = scores.reshape(-1)
    topk = min(topk, flat.shape[0])
    scores_per_image, topk_idx = jax.lax.top_k(flat, topk)
    labels = topk_idx % (k - 1)
    query_idx = topk_idx // (k - 1)
    masks = jnp.take(mask_pred, query_idx, axis=0)

    binary = masks > 0
    mask_scores = (jax.nn.sigmoid(masks) * binary).sum((1, 2)) / (
        binary.sum((1, 2)) + 1e-6
    )
    scores_final = scores_per_image * mask_scores
    valid = (
        jnp.take(thing_mask, labels) if thing_mask is not None
        else jnp.ones_like(labels, dtype=bool)
    )
    return {
        "pred_masks": binary,
        "scores": jnp.where(valid, scores_final, 0.0),
        "pred_classes": labels,
        "valid": valid,
    }


def panoptic_merge(
    mask_cls: np.ndarray,  # (Q, K)
    mask_pred: np.ndarray,  # (Q, H, W) logits
    thing_ids: set[int],
    object_mask_threshold: float = 0.8,
    overlap_threshold: float = 0.8,
):
    """Host-side sequential panoptic merge. Returns (panoptic_seg (H, W)
    int32, segments_info list)."""
    num_classes = mask_cls.shape[-1] - 1
    probs = _softmax_np(mask_cls)
    scores = probs.max(-1)
    labels = probs.argmax(-1)
    sig = 1.0 / (1.0 + np.exp(-mask_pred))

    keep = (labels != num_classes) & (scores > object_mask_threshold)
    cur_scores = scores[keep]
    cur_classes = labels[keep]
    cur_masks = sig[keep]

    h, w = mask_pred.shape[-2:]
    panoptic_seg = np.zeros((h, w), dtype=np.int32)
    segments_info: list[dict] = []
    if cur_masks.shape[0] == 0:
        return panoptic_seg, segments_info

    cur_prob_masks = cur_scores[:, None, None] * cur_masks
    cur_mask_ids = cur_prob_masks.argmax(0)
    stuff_memory: dict[int, int] = {}
    segment_id = 0
    for k_i in range(cur_classes.shape[0]):
        pred_class = int(cur_classes[k_i])
        isthing = pred_class in thing_ids
        mask = (cur_mask_ids == k_i) & (cur_masks[k_i] >= 0.5)
        # Reference (xdecoder_model.py:1059-1064): overlap ratio uses the
        # FULL argmax region over the >=0.5 area — intersecting the
        # numerator with the 0.5 cut underestimates it and drops segments
        # the reference keeps.
        mask_area = (cur_mask_ids == k_i).sum()
        original_area = (cur_masks[k_i] >= 0.5).sum()
        if mask_area > 0 and original_area > 0 and mask.sum() > 0:
            if mask_area / original_area < overlap_threshold:
                continue
            if not isthing:
                if pred_class in stuff_memory:
                    panoptic_seg[mask] = stuff_memory[pred_class]
                    continue
                stuff_memory[pred_class] = segment_id + 1
            segment_id += 1
            panoptic_seg[mask] = segment_id
            segments_info.append(
                {"id": segment_id, "isthing": bool(isthing), "category_id": pred_class}
            )
    return panoptic_seg, segments_info


def sem_seg_postprocess(result: jax.Array, img_size: tuple[int, int],
                        out_height: int, out_width: int):
    """Crop away padding then resize to the original image size
    (reference modeling/modules/postprocessing.py:99-122)."""
    result = result[..., : img_size[0], : img_size[1]]
    c = result.shape[0]
    return jax.image.resize(
        result, (c, out_height, out_width), method="bilinear"
    )


def _softmax_np(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)
