"""Point sampling ops (PointRend-style).

Parity targets: /root/reference/modeling/modules/point_features.py
(point_sample :21, get_uncertain_point_coords_with_randomness :65) with
grid_sample align_corners=False semantics (pixel = coord * size - 0.5,
zero padding). All shapes static — point counts are fixed at trace time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def point_sample(masks: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sample of (N, H, W) maps at (N, P, 2) xy coords in [0, 1].
    Returns (N, P)."""
    n, h, w = masks.shape
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    out = jnp.zeros(coords.shape[:-1], masks.dtype)
    flat = masks.reshape(n, h * w)
    for dy, dx, wgt in (
        (0, 0, (1 - fy) * (1 - fx)),
        (0, 1, (1 - fy) * fx),
        (1, 0, fy * (1 - fx)),
        (1, 1, fy * fx),
    ):
        xi = x0 + dx
        yi = y0 + dy
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        idx = (
            jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w
            + jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        )
        g = jnp.take_along_axis(flat, idx, axis=1)
        out = out + g * (wgt * valid.astype(masks.dtype))
    return out


def uncertain_point_coords(
    rng: jax.Array,
    logits: jax.Array,  # (N, H, W) mask logits
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> jax.Array:
    """Importance sampling of uncertain points (uncertainty = -|logit|).
    Returns (N, num_points, 2) coords in [0, 1].
    Reference point_features.py:65-123."""
    n = logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    r1, r2 = jax.random.split(rng)
    coords = jax.random.uniform(r1, (n, num_sampled, 2))
    point_logits = point_sample(logits, coords)
    uncertainty = -jnp.abs(point_logits)

    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain
    _, topk_idx = jax.lax.top_k(uncertainty, num_uncertain)
    picked = jnp.take_along_axis(coords, topk_idx[..., None], axis=1)
    if num_random > 0:
        rand = jax.random.uniform(r2, (n, num_random, 2))
        picked = jnp.concatenate([picked, rand], axis=1)
    return picked
