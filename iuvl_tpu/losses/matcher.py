"""Hungarian matcher, TPU-native.

Parity target: /root/reference/modeling/modules/matcher.py:106-170
(memory_efficient_forward): cost = cost_class * (-prob[target]) +
cost_mask * point-sampled pairwise sigmoid-CE + cost_dice * pairwise dice,
over a shared set of randomly sampled points, solved with
``scipy.optimize.linear_sum_assignment``.

TPU design: targets are padded to a static T_max with a validity mask; the
full (B, Q, T) cost tensor is computed on device in one shot (batched
matmuls on the MXU — no per-image Python loop), and only the final
assignment runs on host through ``jax.pure_callback`` (the reference also
does its assignment on CPU inside the step: matcher.py:158-165). Invalid
target columns get a large constant cost so they absorb leftover queries;
their assignments are masked out downstream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.point_sample import point_sample

BIG_COST = 1e6


def pairwise_sigmoid_ce(inputs: jax.Array, targets: jax.Array) -> jax.Array:
    """inputs (Q, P) logits, targets (T, P) in {0,1} -> (Q, T) mean-BCE.
    Decomposition trick (reference matcher.py batch_sigmoid_ce_loss)."""
    p = inputs.shape[-1]
    pos = jax.nn.softplus(-inputs)  # loss when target == 1
    neg = jax.nn.softplus(inputs)  # loss when target == 0
    return (
        jnp.einsum("qp,tp->qt", pos, targets)
        + jnp.einsum("qp,tp->qt", neg, 1.0 - targets)
    ) / p


def pairwise_dice(inputs: jax.Array, targets: jax.Array) -> jax.Array:
    """inputs (Q, P) logits, targets (T, P) -> (Q, T) dice loss."""
    probs = jax.nn.sigmoid(inputs)
    numerator = 2.0 * jnp.einsum("qp,tp->qt", probs, targets)
    denominator = probs.sum(-1)[:, None] + targets.sum(-1)[None, :]
    return 1.0 - (numerator + 1.0) / (denominator + 1.0)


def _lsa_host(cost: np.ndarray) -> np.ndarray:
    """Host callback: per-image linear_sum_assignment.
    cost: (B, Q, T) -> (B, T) assigned query index per target column."""
    from scipy.optimize import linear_sum_assignment

    cost = np.nan_to_num(np.asarray(cost, dtype=np.float64), nan=BIG_COST)
    b, q, t = cost.shape
    out = np.zeros((b, t), dtype=np.int32)
    for i in range(b):
        rows, cols = linear_sum_assignment(cost[i])
        out[i, cols] = rows.astype(np.int32)
    return out


def compute_match_cost(
    rng: jax.Array,
    pred_logits: jax.Array,  # (B, Q, K)
    pred_masks: jax.Array,  # (B, Q, H, W)
    tgt_labels: jax.Array,  # (B, T) int
    tgt_masks: jax.Array,  # (B, T, H, W) float {0,1}
    tgt_valid: jax.Array,  # (B, T) bool
    num_points: int = 12544,
    cost_class: float = 2.0,
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
) -> jax.Array:
    """Vectorized (B, Q, T) matching cost."""
    b, q = pred_logits.shape[:2]
    t = tgt_labels.shape[1]
    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    c_class = -jnp.take_along_axis(prob, tgt_labels[:, None, :], axis=2)  # (B, Q, T)

    coords = jax.random.uniform(rng, (b, 1, num_points, 2))
    coords_q = jnp.broadcast_to(coords, (b, q, num_points, 2)).reshape(
        b * q, num_points, 2
    )
    coords_t = jnp.broadcast_to(coords, (b, t, num_points, 2)).reshape(
        b * t, num_points, 2
    )
    pm = point_sample(
        pred_masks.astype(jnp.float32).reshape(b * q, *pred_masks.shape[2:]), coords_q
    ).reshape(b, q, num_points)
    tm = point_sample(
        tgt_masks.astype(jnp.float32).reshape(b * t, *tgt_masks.shape[2:]), coords_t
    ).reshape(b, t, num_points)

    c_mask = jax.vmap(pairwise_sigmoid_ce)(pm, tm)
    c_dice = jax.vmap(pairwise_dice)(pm, tm)

    cost = cost_class * c_class + cost_mask * c_mask + cost_dice * c_dice
    cost = jnp.where(jnp.isfinite(cost), cost, BIG_COST)
    # Invalid target columns absorb leftover queries at uniform high cost.
    return jnp.where(tgt_valid[:, None, :], cost, BIG_COST)


def hungarian_match(cost: jax.Array) -> jax.Array:
    """(B, Q, T) cost -> (B, T) assigned query per target (host LSA)."""
    b, _, t = cost.shape
    return jax.pure_callback(
        _lsa_host,
        jax.ShapeDtypeStruct((b, t), jnp.int32),
        jax.lax.stop_gradient(cost),
        vmap_method="sequential",
    )
