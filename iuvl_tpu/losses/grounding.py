"""Grounding + VLP (caption/captioning/retrieval) training losses.

Parity targets:
- loss_groundings (/root/reference/modeling/modules/criterion.py:395-509):
  per-image similarity between grounding-query caption embeddings and
  phrase embeddings -> Hungarian match (grounding mode, matcher.py:253-315)
  -> point-sampled BCE + dice on matched grounding masks + a
  text-to-image CE whose targets share credit across duplicate phrases
  (hash table -> here a precomputed group matrix), weighted by
  GROUNDING.TEXT_WEIGHT / CLASS_WEIGHT (2.0 / 0.5).
- loss_captionings (criterion.py:274-294): teacher-forced token CE of
  predicted caption embeddings against the frozen token-embedding matrix.
- loss_itc (criterion.py:198-232): image-text contrastive on the class
  query vs pooled caption embedding (queue variant reduces to the global
  symmetric CE under SPMD).
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp

from ..ops.point_sample import (
    WideTable,
    point_sample,
    point_sample_from_table,
    point_sample_shared,
    uncertain_point_coords,
)
from .language import clamped_scale, contrastive_loss
from .matcher import BIG_COST, hungarian_match, pairwise_dice, pairwise_sigmoid_ce


@flax.struct.dataclass
class GroundingTargets:
    masks: jax.Array  # (B, G, H, W) float {0,1}
    class_embs: jax.Array  # (B, G, D) pooled phrase embeddings
    group_matrix: jax.Array  # (B, G, G) 1 iff phrases identical
    valid: jax.Array  # (B, G) bool
    task_weight: jax.Array  # (B,) grounding weight (2.0 text / 0.5 class)


@dataclasses.dataclass(frozen=True)
class GroundingConfig:
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    cost_class: float = 2.0
    cost_mask: float = 5.0
    cost_dice: float = 5.0


def grounding_cost(
    rng: jax.Array,
    pred_gmasks: jax.Array,  # (B, Q, H, W)
    pred_gtexts: jax.Array,  # (B, Q, D)
    targets: GroundingTargets,
    logit_scale: jax.Array,
    cfg: GroundingConfig = GroundingConfig(),
) -> jax.Array:
    """(B, Q, G) matching cost for external batched solving: call with the
    SAME rng later passed to ``grounding_losses(..., assigned=...)`` and
    the result is bit-identical to the internal matching path."""
    b, q = pred_gmasks.shape[:2]
    v = pred_gtexts / (jnp.linalg.norm(pred_gtexts, axis=-1, keepdims=True) + 1e-7)
    t = targets.class_embs / (
        jnp.linalg.norm(targets.class_embs, axis=-1, keepdims=True) + 1e-7
    )
    sim = clamped_scale(logit_scale) * jnp.einsum("bqd,bgd->bqg", v, t)

    rng, r_pts, r_loss = jax.random.split(rng, 3)
    coords = jax.random.uniform(r_pts, (b, cfg.num_points // 4, 2))
    # shared points across queries/targets: channels-wide row gathers
    # (point_sample_shared docstring has the measured rate argument)
    pm = point_sample_shared(pred_gmasks.astype(jnp.float32), coords)
    tm = point_sample_shared(targets.masks.astype(jnp.float32), coords)
    cost = (
        cfg.cost_class * (-jax.nn.softmax(sim, axis=1))
        + cfg.cost_mask * jax.vmap(pairwise_sigmoid_ce)(pm, tm)
        + cfg.cost_dice * jax.vmap(pairwise_dice)(pm, tm)
    )
    cost = jnp.where(jnp.isfinite(cost), cost, BIG_COST)
    return jnp.where(targets.valid[:, None, :], cost, BIG_COST)


def grounding_losses(
    rng: jax.Array,
    pred_gmasks: jax.Array,  # (B, Q, H, W)
    pred_gtexts: jax.Array,  # (B, Q, D)
    targets: GroundingTargets,
    logit_scale: jax.Array,
    cfg: GroundingConfig = GroundingConfig(),
    assigned: jax.Array | None = None,  # (B, G) from an external batched solve
    tgt_table: WideTable | None = None,  # shared prebuilt gt table (per step)
) -> dict[str, jax.Array]:
    b, q = pred_gmasks.shape[:2]
    g = targets.masks.shape[1]
    rng0 = rng  # grounding_cost re-derives r_pts from the same entry rng

    v = pred_gtexts / (jnp.linalg.norm(pred_gtexts, axis=-1, keepdims=True) + 1e-7)
    t = targets.class_embs / (
        jnp.linalg.norm(targets.class_embs, axis=-1, keepdims=True) + 1e-7
    )
    sim = clamped_scale(logit_scale) * jnp.einsum("bqd,bgd->bqg", v, t)

    # ---- matching (internal unless solved externally via grounding_cost) - #
    rng, r_pts, r_loss = jax.random.split(rng, 3)
    if assigned is None:
        cost = grounding_cost(
            rng0, pred_gmasks, pred_gtexts, targets, logit_scale, cfg
        )
        assigned = hungarian_match(cost)  # (B, G)

    # ---- point-sampled BCE + dice on matched masks ---- #
    src = jnp.take_along_axis(pred_gmasks, assigned[:, :, None, None], axis=1)
    src_flat = src.reshape(b * g, *src.shape[2:]).astype(jnp.float32)
    pcoords = uncertain_point_coords(
        r_loss, jax.lax.stop_gradient(src_flat), cfg.num_points,
        cfg.oversample_ratio, cfg.importance_sample_ratio,
    )
    pl_ = point_sample(src_flat, pcoords)
    # tgt_table (prebuilt shared WideTable) measured NEGATIVE in the
    # composed criterion (scripts/ab_gt_table.py) — XLA's cross-layer CSE
    # of the unmaterialized form wins; kept selectable for parity with
    # CriterionConfig.gt_table_dtype.
    if tgt_table is not None:
        tl = point_sample_from_table(tgt_table, jax.lax.stop_gradient(pcoords))
    else:
        tgt_flat = targets.masks.reshape(
            b * g, *targets.masks.shape[2:]
        ).astype(jnp.float32)
        tl = point_sample(tgt_flat, jax.lax.stop_gradient(pcoords))
    valid = targets.valid.reshape(b * g).astype(jnp.float32)
    num = jnp.maximum(valid.sum(), 1.0)
    bce = ((jax.nn.softplus(pl_) - pl_ * tl).mean(-1) * valid).sum() / num
    probs = jax.nn.sigmoid(pl_)
    dice = (
        (1.0 - (2.0 * (probs * tl).sum(-1) + 1.0)
         / (probs.sum(-1) + tl.sum(-1) + 1.0)) * valid
    ).sum() / num

    # ---- t2i CE with duplicate-phrase credit sharing ---- #
    # gt assignment (B, Q, G): 1 at (assigned[g], g), spread over duplicates.
    onehot = jax.nn.one_hot(assigned, q, axis=1)  # (B, Q, G)
    gm = targets.group_matrix / jnp.maximum(
        targets.group_matrix.sum(-1, keepdims=True), 1.0
    )
    gt_logit = jnp.einsum("bqg,bgh->bqh", onehot, gm)
    logp = jax.nn.log_softmax(
        jnp.swapaxes(sim, 1, 2).astype(jnp.float32), axis=-1
    )  # (B, G, Q): softmax over queries per phrase
    ce = -(jnp.swapaxes(gt_logit, 1, 2) * logp).sum(-1)  # (B, G)
    wvalid = targets.valid.astype(jnp.float32)
    ce = (ce * wvalid).sum(-1) / jnp.maximum(wvalid.sum(-1), 1.0)  # per image
    loss_ce = (ce * targets.task_weight).mean()

    return {
        "loss_grounding_bce_0": bce,
        "loss_grounding_dice_0": dice,
        "loss_grounding_ce_0": loss_ce,
    }


def spatial_losses(
    rng: jax.Array,
    pred_masks: jax.Array,  # (B, P, H, W) unified-head prompt-slot logits
    gt_masks: jax.Array,  # (B, P, H, W) float {0,1}
    valid: jax.Array,  # (B, P) bool
    num_points: int = 12544,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> dict[str, jax.Array]:
    """Spatial-prompt (visual-query) mask losses — the live counterpart of
    reference loss_spatials (criterion.py:511-686). Point-sampled BCE +
    dice on the prompt-slot masks. The reference Hungarian-matches unordered
    spatial queries to targets; here each prompt slot is generated FROM its
    target instance (forward_spatial_train), so the assignment is identity
    and the pos-CE matching term is structurally satisfied."""
    b, p = pred_masks.shape[:2]
    src = pred_masks.reshape(b * p, *pred_masks.shape[2:]).astype(jnp.float32)
    tgt = gt_masks.reshape(b * p, *gt_masks.shape[2:]).astype(jnp.float32)
    coords = uncertain_point_coords(
        rng, jax.lax.stop_gradient(src), num_points,
        oversample_ratio, importance_sample_ratio,
    )
    pl_ = point_sample(src, coords)
    tl = point_sample(tgt, jax.lax.stop_gradient(coords))
    v = valid.reshape(b * p).astype(jnp.float32)
    num = jnp.maximum(v.sum(), 1.0)
    bce = ((jax.nn.softplus(pl_) - pl_ * tl).mean(-1) * v).sum() / num
    probs = jax.nn.sigmoid(pl_)
    dice = (
        (1.0 - (2.0 * (probs * tl).sum(-1) + 1.0)
         / (probs.sum(-1) + tl.sum(-1) + 1.0)) * v
    ).sum() / num
    return {"loss_spatial_bce_0": bce, "loss_spatial_dice_0": dice}


def caption_loss(
    rng: jax.Array,
    pred_captions: jax.Array,  # (B, Q, D) per-query caption embeddings
    assigned: jax.Array,  # (B, T) seg-matcher query assignment
    tgt_labels: jax.Array,  # (B, T)
    tgt_valid: jax.Array,  # (B, T) bool
    class_embeddings: jax.Array,  # (K, D) class-name text embeddings
    phrase_embs: jax.Array,  # (B, P, D) caption noun-phrase embeddings
    phrase_valid: jax.Array,  # (B, P) bool
    phrase_groups: jax.Array,  # (B, P, P) duplicate-phrase matrix
    logit_scale: jax.Array,
) -> jax.Array:
    """Query-caption contrastive loss (reference criterion.py loss_captions
    :298-335): queries matched to gt instances contrast against their
    class-name embeddings; remaining queries are similarity-matched
    (caption_womask matcher mode, matcher.py:459-565) to caption noun
    phrases and contrast against those, with duplicate texts sharing credit.

    Divergence note: the reference merges duplicate texts across the whole
    (all-gathered) batch via hashing; here credit sharing is per image
    (static group matrices) — cross-image duplicate merging is not applied.
    """
    from .language import ql_multi_contrastive_loss

    b, q, d = pred_captions.shape
    t = tgt_labels.shape[1]
    p = phrase_embs.shape[1]

    v_matched = jnp.take_along_axis(pred_captions, assigned[..., None], axis=1)
    t_matched = jnp.take(class_embeddings, tgt_labels, axis=0)  # (B, T, D)

    # Unmatched queries vs phrases: similarity-only matching with matched
    # query slots blocked.
    v_norm = pred_captions / (jnp.linalg.norm(pred_captions, axis=-1, keepdims=True) + 1e-7)
    p_norm = phrase_embs / (jnp.linalg.norm(phrase_embs, axis=-1, keepdims=True) + 1e-7)
    sim = clamped_scale(logit_scale) * jnp.einsum("bqd,bpd->bqp", v_norm, p_norm)
    matched_mask = jnp.zeros((b, q), bool)
    matched_mask = jax.vmap(
        lambda m, a, v: m.at[a].set(v)
    )(matched_mask, assigned, tgt_valid)
    cost = -sim + jnp.where(matched_mask[:, :, None], BIG_COST, 0.0)
    cost = jnp.where(phrase_valid[:, None, :], cost, BIG_COST)
    assigned_p = hungarian_match(cost)  # (B, P)
    v_phrase = jnp.take_along_axis(pred_captions, assigned_p[..., None], axis=1)

    # Per-image contrastive over [matched ; phrase] pairs.
    v_all = jnp.concatenate([v_matched, v_phrase], axis=1).reshape(b * (t + p), d)
    t_all = jnp.concatenate([t_matched, phrase_embs], axis=1).reshape(b * (t + p), d)
    valid_all = jnp.concatenate([tgt_valid, phrase_valid], axis=1).reshape(-1)
    group = jnp.zeros((b, t + p, t + p))
    group = group.at[:, :t, :t].set(jnp.eye(t)[None])
    group = group.at[:, t:, t:].set(phrase_groups)
    group_full = jax.scipy.linalg.block_diag(*[group[i] for i in range(b)])

    v_all = v_all / (jnp.linalg.norm(v_all, axis=-1, keepdims=True) + 1e-7)
    t_all = t_all / (jnp.linalg.norm(t_all, axis=-1, keepdims=True) + 1e-7)
    return ql_multi_contrastive_loss(
        v_all, t_all, group_full, logit_scale, valid=valid_all
    )


def captioning_loss(
    pred_captionings: jax.Array,  # (B, T, D) caption-slot embeddings
    token_embedding: jax.Array,  # (V, D) frozen text-tower token table
    target_ids: jax.Array,  # (B, T) caption token ids
    target_mask: jax.Array,  # (B, T) 1 = real token
) -> jax.Array:
    """Teacher-forced next-token CE (reference criterion.py:274-294)."""
    logits = pred_captionings[:, :-1].astype(jnp.float32) @ token_embedding.T.astype(
        jnp.float32
    )
    tgt = target_ids[:, 1:]
    msk = target_mask[:, 1:].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return (nll * msk).sum() / (msk.sum() + 1.0)


def retrieval_loss(
    class_query_emb: jax.Array,  # (B, D) — pred_captions[:, -1]
    caption_emb: jax.Array,  # (B, D) pooled caption embeddings
    logit_scale: jax.Array,
) -> jax.Array:
    """Decoder-side image-text contrastive (reference loss_itc first term)."""
    v = class_query_emb / (jnp.linalg.norm(class_query_emb, axis=-1, keepdims=True) + 1e-7)
    t = caption_emb / (jnp.linalg.norm(caption_emb, axis=-1, keepdims=True) + 1e-7)
    return contrastive_loss(v, t, logit_scale)
