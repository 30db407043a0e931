"""Set criterion (DETR-style) for the seg stream, TPU-native.

Parity target: /root/reference/modeling/modules/criterion.py — ``labels``
cross-entropy with no-object coefficient (:138-169) and ``masks``
point-sampled sigmoid-CE + dice with importance sampling (:337-393), applied
to the final layer plus all aux layers with the weight dict built in
xdecoder_model.from_config (:127-195: class 2.0 / bce 5.0 / dice 5.0,
no-object 0.1, 12544 points, oversample 3.0, importance 0.75).

TPU design: targets are dense padded tensors (static T_max) with validity
masks; ``num_masks`` normalization is global because the jitted step sees
the full (sharded) batch — the reference's explicit all_reduce
(criterion.py:779-781) is subsumed by SPMD semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from ..ops.point_sample import (
    WideTable,
    build_wide_table,
    point_sample,
    point_sample_from_table,
    point_sample_trainable,
    uncertain_point_coords,
)
from .matcher import batched_hungarian, compute_match_cost, hungarian_match


@flax.struct.dataclass
class SegTargets:
    labels: jax.Array  # (B, T) int32 class ids
    masks: jax.Array  # (B, T, H, W) float {0, 1} at mask_pred resolution scale
    valid: jax.Array  # (B, T) bool
    boxes: Any = None  # optional (B, T, 4) cxcywh in [0,1] (DETECTION on)


@dataclasses.dataclass(frozen=True)
class CriterionConfig:
    num_classes: int  # K - 1 (no-object/background index == num_classes)
    eos_coef: float = 0.1
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    box_weight: float = 5.0  # reference BOX_WEIGHT
    giou_weight: float = 2.0  # reference GIOU_WEIGHT
    top_mask_layers: int = 10
    # gt sampling: share ONE materialized wide table across decoder layers
    # (bf16 storage is exact for binary gt). Measured NEGATIVE in-context
    # (scripts/ab_gt_table.py, v5e: losses phase 218.0 ms table vs 173.4 ms
    # rebuild) despite winning isolated 6.1 vs 13.4 ms/layer
    # (scripts/bench_gt_sample.py) — XLA already CSEs the unmaterialized
    # shifted-stack across the 10 layers and the barrier breaks that.
    # Kept selectable; None (default) = per-layer rebuild in f32.
    gt_table_dtype: str | None = None


class SegCriterion:
    def __init__(self, cfg: CriterionConfig):
        self.cfg = cfg

    # ---------------- individual losses ---------------- #
    def loss_labels(self, pred_logits, targets: SegTargets, assigned):
        """Reference criterion.py:138-169."""
        c = self.cfg
        b, q, k = pred_logits.shape
        no_object = c.num_classes  # index of the background/no-object column
        tc = jnp.full((b, q), no_object, jnp.int32)
        scatter_vals = jnp.where(targets.valid, targets.labels, no_object).astype(
            jnp.int32
        )
        tc = tc.at[jnp.arange(b)[:, None], assigned].set(scatter_vals)

        logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, tc[..., None], axis=-1)[..., 0]
        w = jnp.where(tc == no_object, c.eos_coef, 1.0)
        return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)

    def loss_masks(self, rng, pred_masks, targets: SegTargets, assigned, num_masks,
                   tgt_table: WideTable | None = None):
        """Reference criterion.py:337-393.

        ``tgt_table``: prebuilt gt :class:`WideTable` shared across decoder
        layers (the gt masks are constant per step; resampling them from a
        shared bf16 table costs ~6 ms/layer vs ~13 ms rebuilt at 1024² —
        bit-exact for binary gt, see point_sample.build_wide_table).
        CAVEAT: that per-layer win measures NET NEGATIVE composed across
        the 10 layers (XLA already CSEs the unmaterialized shifted stack;
        the barrier keeping the table resident breaks that) — it stays
        opt-in, off by default; see CriterionConfig.gt_table_dtype."""
        c = self.cfg
        b, q, h, w = pred_masks.shape
        t = targets.labels.shape[1]
        src = jnp.take_along_axis(
            pred_masks, assigned[:, :, None, None], axis=1
        )  # (B, T, H, W)
        src_flat = src.reshape(b * t, h, w).astype(jnp.float32)

        coords = uncertain_point_coords(
            rng, jax.lax.stop_gradient(src_flat), c.num_points,
            c.oversample_ratio, c.importance_sample_ratio,
        )
        # trainable variant: d_masks via the Pallas tap scatter — the plain
        # VJP's XLA scatter was the criterion backward's largest item
        # (20.4 ms/layer at B=2, scripts/bench_crit_scatter.py)
        point_logits = point_sample_trainable(src_flat, coords)  # (B*T, P)
        if tgt_table is not None:
            point_labels = point_sample_from_table(
                tgt_table, jax.lax.stop_gradient(coords)
            )
        else:
            tgt_flat = targets.masks.reshape(
                b * t, *targets.masks.shape[2:]
            ).astype(jnp.float32)
            point_labels = point_sample(
                tgt_flat, jax.lax.stop_gradient(coords),
                # gt is binary {0,1}: bf16 gather table is bit-exact and
                # halves the 1024^2 gather bytes (12.28 -> 9.93 ms/layer
                # isolated, scripts/bench_gt_sample_r5.py)
                store_dtype=jnp.bfloat16,
            )

        valid = targets.valid.reshape(b * t).astype(jnp.float32)
        bce = (
            jax.nn.softplus(point_logits) - point_logits * point_labels
        ).mean(-1)
        loss_bce = (bce * valid).sum() / num_masks

        probs = jax.nn.sigmoid(point_logits)
        numerator = 2.0 * (probs * point_labels).sum(-1)
        denominator = probs.sum(-1) + point_labels.sum(-1)
        dice = 1.0 - (numerator + 1.0) / (denominator + 1.0)
        loss_dice = (dice * valid).sum() / num_masks
        return loss_bce, loss_dice

    def loss_boxes(self, pred_boxes, targets_boxes, tgt_valid, assigned,
                   num_masks):
        """Box L1 + GIoU loss (reference criterion.py:688-760, the
        DETECTION:True branch). pred_boxes (B, Q, 4) cxcywh normalized;
        targets_boxes (B, T, 4) cxcywh."""
        from ..ops.boxes import box_cxcywh_to_xyxy, generalized_box_iou

        src = jnp.take_along_axis(pred_boxes, assigned[..., None], axis=1)
        valid = tgt_valid.astype(jnp.float32)
        l1 = jnp.abs(src - targets_boxes).sum(-1)
        loss_l1 = (l1 * valid).sum() / num_masks
        b = src.shape[0]
        giou_diag = jax.vmap(
            lambda s, t: jnp.diagonal(
                generalized_box_iou(box_cxcywh_to_xyxy(s), box_cxcywh_to_xyxy(t))
            )
        )(src, targets_boxes)
        loss_giou = ((1.0 - giou_diag) * valid).sum() / num_masks
        return loss_l1, loss_giou

    # ---------------- full forward ---------------- #
    def __call__(
        self,
        rng: jax.Array,
        outputs: dict[str, Any],
        targets: SegTargets,
        match_points: int = 12544,
    ) -> dict[str, jax.Array]:
        """outputs: UnifiedDecoder dict (obj-query block only: Q = 100+1
        sliced to the first num_queries-1 masks by the caller, matching
        reference forward_seg:352-380). Returns the weighted loss dict."""
        costs, kept = self.collect_costs(rng, outputs, targets, match_points)
        assignments = batched_hungarian(costs)
        return self.losses_from_assignments(kept, assignments, targets)

    def collect_costs(self, rng, outputs, targets: SegTargets,
                      match_points: int = 12544):
        """Phase 1: per-layer matching costs (stop-gradient) + kept-layer
        records. The caller solves them — normally through ONE
        ``batched_hungarian`` call, possibly merged with the caption /
        grounding costs of the same step (the auction while_loop runs all
        lanes in parallel, so one merged solve costs about one solve). The
        rng split sequence is identical to the former fused loop."""
        c = self.cfg
        layer_outputs = list(outputs["aux_outputs"]) + [
            {k: outputs.get(k)
             for k in ("pred_logits", "pred_masks", "pred_boxes")}
        ]
        kept: list[tuple[int, Any, jax.Array, int]] = []
        costs = []
        n_layers = len(layer_outputs)
        for layer_id, layer_out in enumerate(layer_outputs):
            rng, r_match, r_pts = jax.random.split(rng, 3)
            # Reference top_x_layers semantics: the FINAL layer's loss is
            # always kept; top_mask_layers trims the earliest aux layers.
            if layer_id < max(0, n_layers - c.top_mask_layers):
                continue
            costs.append(compute_match_cost(
                r_match,
                jax.lax.stop_gradient(layer_out["pred_logits"]),
                jax.lax.stop_gradient(layer_out["pred_masks"]),
                targets.labels, targets.masks, targets.valid,
                num_points=match_points,
                cost_class=c.class_weight,
                cost_mask=c.mask_weight,
                cost_dice=c.dice_weight,
            ))
            kept.append((layer_id, layer_out, r_pts, n_layers))
        return costs, kept

    def losses_from_assignments(self, kept, assignments,
                                targets: SegTargets) -> dict[str, jax.Array]:
        """Phase 2: weighted losses from the solved assignments."""
        c = self.cfg
        num_masks = jnp.maximum(targets.valid.sum().astype(jnp.float32), 1.0)
        losses: dict[str, jax.Array] = {}
        b, t = targets.masks.shape[:2]
        tgt_table = build_wide_table(
            targets.masks.reshape(b * t, *targets.masks.shape[2:]),
            store_dtype=jnp.dtype(c.gt_table_dtype),
        ) if kept and c.gt_table_dtype is not None else None
        for (layer_id, layer_out, r_pts, n_layers), assigned in zip(
            kept, assignments
        ):
            suffix = "_0" if layer_id == n_layers - 1 else f"_{layer_id + 1}"
            ce = self.loss_labels(layer_out["pred_logits"], targets, assigned)
            bce, dice = self.loss_masks(
                r_pts, layer_out["pred_masks"], targets, assigned, num_masks,
                tgt_table=tgt_table,
            )
            losses[f"loss_mask_ce{suffix}"] = c.class_weight * ce
            losses[f"loss_mask_bce{suffix}"] = c.mask_weight * bce
            losses[f"loss_mask_dice{suffix}"] = c.dice_weight * dice
            if layer_out.get("pred_boxes") is not None and targets.boxes is not None:
                l1, giou = self.loss_boxes(
                    layer_out["pred_boxes"], targets.boxes, targets.valid,
                    assigned, num_masks,
                )
                losses[f"loss_bbox{suffix}"] = c.box_weight * l1
                losses[f"loss_giou{suffix}"] = c.giou_weight * giou
        return losses
