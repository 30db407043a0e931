"""OpenImages-style open-vocabulary criterion + matcher mode.

Parity target: /root/reference/modeling/modules/criterion.py
loss_labels_openimage (:171-196) + forward_openimage/openimage_forward
(:788-860) and matcher.py openimage mode (:171-252): per image, the
query-caption embeddings are scored against [its positive class texts ;
a global pool of negative class texts] (vl_similarity with the language
logit scale); the Hungarian match combines that class probability with
point-sampled mask costs; the class loss is a CE that pushes each matched
query's similarity to its positive class among all candidates.

TPU-first redesign: the reference's per-image ragged loops + hash-based
negative dedup become static (B, T_pos) positives with validity masks and
one (N_neg, D) replicated negative bank (dedup is host-side at batch
build). One fused program: similarity -> cost -> host-callback LSA ->
CE + mask losses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.point_sample import point_sample_shared
from .language import clamped_scale
from .matcher import BIG_COST, hungarian_match, pairwise_dice, pairwise_sigmoid_ce


def openimage_losses(
    rng: jax.Array,
    pred_captions: jax.Array,  # (B, Q, D) query caption embeddings
    pred_masks: jax.Array,  # (B, Q, H, W)
    pos_class_embs: jax.Array,  # (B, T, D) per-image positive class texts
    tgt_masks: jax.Array,  # (B, T, H, W)
    tgt_valid: jax.Array,  # (B, T) bool
    neg_class_embs: jax.Array,  # (N, D) global negative bank (deduped)
    logit_scale: jax.Array,
    num_points: int = 12544,
    cost_class: float = 2.0,
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
) -> dict[str, jax.Array]:
    b, q = pred_captions.shape[:2]
    t = pos_class_embs.shape[1]

    v = pred_captions / (
        jnp.linalg.norm(pred_captions, axis=-1, keepdims=True) + 1e-7
    )
    pos = pos_class_embs / (
        jnp.linalg.norm(pos_class_embs, axis=-1, keepdims=True) + 1e-7
    )
    neg = neg_class_embs / (
        jnp.linalg.norm(neg_class_embs, axis=-1, keepdims=True) + 1e-7
    )
    scale = clamped_scale(logit_scale)
    sim_pos = scale * jnp.einsum("bqd,btd->bqt", v, pos)  # (B, Q, T)
    sim_neg = scale * jnp.einsum("bqd,nd->bqn", v, neg)  # (B, Q, N)
    sim = jnp.concatenate([sim_pos, sim_neg], axis=-1)  # (B, Q, T+N)

    # ---- matching: class prob over [pos; neg] + point-sampled masks ---- #
    rng, r_pts = jax.random.split(rng)
    coords = jax.random.uniform(r_pts, (b, num_points // 4, 2))
    # shared points across queries/targets: channels-wide row gathers
    pm = point_sample_shared(pred_masks.astype(jnp.float32), coords)
    tm = point_sample_shared(tgt_masks.astype(jnp.float32), coords)
    cost = (
        cost_class * (-jax.nn.softmax(sim, axis=-1)[..., :t])
        + cost_mask * jax.vmap(pairwise_sigmoid_ce)(pm, tm)
        + cost_dice * jax.vmap(pairwise_dice)(pm, tm)
    )
    cost = jnp.where(jnp.isfinite(cost), cost, BIG_COST)
    cost = jnp.where(tgt_valid[:, None, :], cost, BIG_COST)
    assigned = hungarian_match(cost)  # (B, T)

    # ---- class CE on matched queries (loss_labels_openimage) ---- #
    logp = jax.nn.log_softmax(sim.astype(jnp.float32), axis=-1)  # (B, Q, T+N)
    matched_logp = jnp.take_along_axis(
        logp, assigned[:, :, None], axis=1
    )  # (B, T, T+N)
    per_tgt = -jnp.take_along_axis(
        matched_logp, jnp.arange(t)[None, :, None], axis=2
    )[..., 0]  # (B, T): -log p(correct pos class)
    wv = tgt_valid.astype(jnp.float32)
    loss_ce = (per_tgt * wv).sum() / jnp.maximum(wv.sum(), 1.0)

    # ---- matched mask bce + dice (forward_openimage mask terms) ---- #
    src = jnp.take_along_axis(pm, assigned[:, :, None], axis=1)  # (B, T, P)
    bce = (jax.nn.softplus(src) - src * tm).mean(-1)
    probs = jax.nn.sigmoid(src)
    dice = 1.0 - (2.0 * (probs * tm).sum(-1) + 1.0) / (
        probs.sum(-1) + tm.sum(-1) + 1.0
    )
    num = jnp.maximum(wv.sum(), 1.0)
    return {
        "loss_openimage_ce_0": loss_ce,
        "loss_openimage_bce_0": (bce * wv).sum() / num,
        "loss_openimage_dice_0": (dice * wv).sum() / num,
    }
