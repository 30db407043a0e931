"""Language-side contrastive losses, TPU-native.

Parity target: /root/reference/modeling/language/loss.py —
vl_contrastive / image_text_contrastive_loss_queue (:101-232, symmetric CE
over the similarity matrix), ql_multi_contrastive_loss (:192, soft CE with
hash-grouped duplicate texts), vl_similarity (:186).

SPMD note: the reference wraps every loss in an autograd-aware all_gather
(loss.py:34-40) because each DDP rank only sees its shard. Under pjit the
jitted step computes on the GLOBAL batch, so the gathers are implicit —
XLA inserts them when the data-sharded activations meet the full matmul.
Duplicate-text hashing becomes a host-precomputed group matrix (static
shapes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

MAX_LOGIT_SCALE = 100.0


def clamped_scale(logit_scale: jax.Array) -> jax.Array:
    return jnp.minimum(jnp.exp(logit_scale), MAX_LOGIT_SCALE)


def vl_similarity(image_feat, text_feat, logit_scale):
    """Reference loss.py:186-190."""
    return clamped_scale(logit_scale) * image_feat @ text_feat.T


def soft_cross_entropy(logits: jax.Array, soft_targets: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(soft_targets * logp).sum(-1).mean()


def contrastive_loss(
    image_feat: jax.Array,  # (N, D) normalized
    text_feat: jax.Array,  # (N, D) normalized
    logit_scale: jax.Array,
    valid: Optional[jax.Array] = None,  # (N,) bool — padded rows ignored
) -> jax.Array:
    """Symmetric InfoNCE (reference vl_contrastive_loss /
    image_text_contrastive_loss_queue)."""
    logits = clamped_scale(logit_scale) * image_feat @ text_feat.T
    n = logits.shape[0]
    if valid is not None:
        big_neg = jnp.where(valid, 0.0, -1e9)
        logits = logits + big_neg[None, :]  # mask padded texts as candidates
    labels = jnp.arange(n)
    logp_i = jax.nn.log_softmax(logits, axis=-1)
    logp_t = jax.nn.log_softmax(logits.T + (big_neg[None, :] if valid is not None else 0.0), axis=-1)
    nll_i = -jnp.take_along_axis(logp_i, labels[:, None], 1)[:, 0]
    nll_t = -jnp.take_along_axis(logp_t, labels[:, None], 1)[:, 0]
    if valid is not None:
        w = valid.astype(jnp.float32)
        return 0.5 * ((nll_i * w).sum() + (nll_t * w).sum()) / jnp.maximum(w.sum(), 1.0)
    return 0.5 * (nll_i.mean() + nll_t.mean())


def ql_multi_contrastive_loss(
    image_feat: jax.Array,  # (N, D) normalized query embeddings
    text_feat: jax.Array,  # (N, D) normalized text embeddings (with dups)
    group_matrix: jax.Array,  # (N, N) — [i, j] = 1 iff text_i == text_j
    logit_scale: jax.Array,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Soft-target CE where duplicate texts share credit (reference
    ql_multi_contrastive_loss:192-215; the unique-text dedup becomes soft
    targets spread over the duplicate group — same gradient structure with
    static shapes)."""
    logits = clamped_scale(logit_scale) * image_feat @ text_feat.T  # (N, N)
    if valid is not None:
        logits = logits + jnp.where(valid, 0.0, -1e9)[None, :]
        group_matrix = group_matrix * valid[None, :] * valid[:, None]
    gt_img = group_matrix / jnp.maximum(group_matrix.sum(-1, keepdims=True), 1e-7)
    loss_img = soft_cross_entropy(logits, gt_img)
    gt_txt = group_matrix / jnp.maximum(group_matrix.sum(0, keepdims=True), 1e-7)
    loss_txt = soft_cross_entropy(logits.T, gt_txt.T)
    return 0.7 * loss_img + 0.3 * loss_txt
