"""Instance segmentation AP evaluator (COCO-style), from scratch.

Parity target: /root/reference/datasets/evaluation/instance_evaluation.py
(:30+), which defers to pycocotools. Reimplemented: per-class greedy
matching by score order at IoU thresholds 0.5:0.95:0.05, 101-point
interpolated AP, averaged over classes and thresholds (segm AP).
"""

from __future__ import annotations

import numpy as np


def mask_iou(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """pred (P, H*W) bool, gt (G, H*W) bool -> (P, G) IoU."""
    pred_f = pred.astype(np.float64)
    gt_f = gt.astype(np.float64)
    inter = pred_f @ gt_f.T
    union = pred_f.sum(1)[:, None] + gt_f.sum(1)[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


class InstanceAPEvaluator:
    def __init__(self, num_classes: int, iou_thresholds=None):
        self.num_classes = num_classes
        self.iou_thresholds = (
            iou_thresholds
            if iou_thresholds is not None
            else np.round(np.arange(0.5, 1.0, 0.05), 2)
        )
        self.reset()

    def reset(self):
        # Per class: list of (score, matched_at_each_threshold: (T,) bool)
        self.dets: dict[int, list] = {c: [] for c in range(self.num_classes)}
        self.n_gt: dict[int, int] = {c: 0 for c in range(self.num_classes)}

    def process(self, pred_masks, pred_scores, pred_classes, gt_masks, gt_classes):
        """pred_masks (P, H, W) bool, scores (P,), classes (P,);
        gt_masks (G, H, W) bool, gt_classes (G,)."""
        # reshape(n, -1) cannot infer -1 when n == 0 (empty preds or
        # all-padding gt must not abort the eval run).
        pred_masks = np.asarray(pred_masks, bool)
        pred_masks = pred_masks.reshape(len(pred_masks), pred_masks[0].size
                                        if len(pred_masks) else 0)
        gt_masks = np.asarray(gt_masks, bool)
        gt_masks = gt_masks.reshape(len(gt_masks), gt_masks[0].size
                                    if len(gt_masks) else 0)
        pred_scores = np.asarray(pred_scores)
        pred_classes = np.asarray(pred_classes)
        gt_classes = np.asarray(gt_classes)

        for c in np.unique(np.concatenate([pred_classes, gt_classes])):
            c = int(c)
            p_idx = np.where(pred_classes == c)[0]
            g_idx = np.where(gt_classes == c)[0]
            self.n_gt[c] = self.n_gt.get(c, 0) + len(g_idx)
            if len(p_idx) == 0:
                continue
            order = p_idx[np.argsort(-pred_scores[p_idx])]
            ious = (
                mask_iou(pred_masks[order], gt_masks[g_idx])
                if len(g_idx)
                else np.zeros((len(order), 0))
            )
            taken = np.zeros((len(self.iou_thresholds), len(g_idx)), bool)
            for pi, p in enumerate(order):
                matched = np.zeros(len(self.iou_thresholds), bool)
                for ti, t in enumerate(self.iou_thresholds):
                    best, best_g = t, -1
                    for gi in range(len(g_idx)):
                        if not taken[ti, gi] and ious[pi, gi] >= best:
                            best, best_g = ious[pi, gi], gi
                    if best_g >= 0:
                        taken[ti, best_g] = True
                        matched[ti] = True
                self.dets.setdefault(c, []).append(
                    (float(pred_scores[p]), matched)
                )

    def merge(self, other):
        for c, lst in other.dets.items():
            self.dets.setdefault(c, []).extend(lst)
        for c, n in other.n_gt.items():
            self.n_gt[c] = self.n_gt.get(c, 0) + n

    def _ap(self, recalls, precisions) -> float:
        # 101-point interpolation.
        ap = 0.0
        for t in np.linspace(0, 1, 101):
            prec = precisions[recalls >= t]
            ap += prec.max() if prec.size else 0.0
        return ap / 101

    def evaluate(self) -> dict[str, float]:
        aps, ap50s, ap75s = [], [], []
        for c, dets in self.dets.items():
            n_gt = self.n_gt.get(c, 0)
            if n_gt == 0:
                continue
            if not dets:
                aps.append(0.0)
                ap50s.append(0.0)
                ap75s.append(0.0)
                continue
            dets_sorted = sorted(dets, key=lambda d: -d[0])
            matched = np.stack([d[1] for d in dets_sorted])  # (D, T)
            ap_per_t = []
            for ti in range(len(self.iou_thresholds)):
                tp = np.cumsum(matched[:, ti])
                fp = np.cumsum(~matched[:, ti])
                recalls = tp / n_gt
                precisions = tp / np.maximum(tp + fp, 1)
                ap_per_t.append(self._ap(recalls, precisions))
            aps.append(float(np.mean(ap_per_t)))
            ap50s.append(ap_per_t[0])
            idx75 = int(np.argmin(np.abs(self.iou_thresholds - 0.75)))
            ap75s.append(ap_per_t[idx75])
        if not aps:
            return {}
        return {
            "AP": 100 * float(np.mean(aps)),
            "AP50": 100 * float(np.mean(ap50s)),
            "AP75": 100 * float(np.mean(ap75s)),
        }
