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
    Returns (N, P).

    TPU layout: the four bilinear taps of one point live at flat offsets
    {0, 1, w, w+1} of the base cell, so they are packed into ONE gather of
    width-4 rows from a shifted-stack of the map (the gather unit is
    issue-rate bound per row regardless of row width — 4x fewer rows than
    a gather per tap). Out-of-image taps read zero-padded or neighbouring
    values and carry exactly-zero weights, so the result is identical to
    the per-tap clip-and-mask formulation (weight formula and tap
    accumulation order unchanged).

    For small maps the batch dim is collapsed into the row index so the
    gather is a flat 2-D take — that HLO path measured ~4x faster than the
    batched take_along_axis at 256^2 (the same trick as ops/msdeform.py's
    flat gather), while at 1024^2 the flat table is slower, so large maps
    keep the batched form.
    """
    n, h, w = masks.shape
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    flat = masks.reshape(n, h * w)
    pad = w + 1
    span = h * w + w + 1  # max base index (hw + w) + 1
    padded = jnp.pad(flat, ((0, 0), (pad, pad)))
    wide = jnp.stack(
        [padded[:, off : off + span] for off in (0, 1, w, w + 1)], axis=-1
    )  # (n, span, 4): wide[:, i, k] = flat value at base i - pad + off_k
    base = (
        y0.astype(jnp.int32) * w + x0.astype(jnp.int32) + pad
    )  # in [0, span-1] for coords in [0, 1]
    base = jnp.clip(base, 0, span - 1)
    if h * w <= 65536:  # flat 2-D gather path (measured crossover: <=256^2)
        rows = base + jnp.arange(n, dtype=jnp.int32)[:, None] * span
        g4 = jnp.take(wide.reshape(n * span, 4), rows.reshape(-1), axis=0)
        g4 = g4.reshape(n, coords.shape[1], 4)
    else:
        g4 = jnp.take_along_axis(wide, base[:, :, None], axis=1)  # (n, P, 4)

    out = jnp.zeros(coords.shape[:-1], masks.dtype)
    for k, (dy, dx, wgt) in enumerate((
        (0, 0, (1 - fy) * (1 - fx)),
        (0, 1, (1 - fy) * fx),
        (1, 0, fy * (1 - fx)),
        (1, 1, fy * fx),
    )):
        xi = x0 + dx
        yi = y0 + dy
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        out = out + g4[..., k] * (wgt * valid.astype(masks.dtype))
    return out


def point_sample_shared(masks: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sample of (B, C, H, W) maps at (B, P, 2) xy coords in [0, 1]
    SHARED across the C channel maps. Returns (B, C, P).

    Layout-aware fast path for the matcher costs: the naive route
    (``point_sample`` after broadcasting coords over C) issues B*C*P*4
    single-element gathers — the TPU gather unit is issue-rate bound per
    ROW (~100M rows/s regardless of row width), so sampling 100 query
    masks at 12544 shared points costs ~130 ms. Gathering channels-last
    rows of width C at the same points is B*P*4 rows (~50x fewer):
    measured ~3 ms for the same shapes. Semantics identical to
    ``point_sample`` (grid_sample align_corners=False, zero padding).
    """
    b, c, h, w = masks.shape
    flat = masks.transpose(0, 2, 3, 1).reshape(b, h * w, c)
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    out = jnp.zeros((b, coords.shape[1], c), masks.dtype)
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
        g = jnp.take_along_axis(flat, idx[:, :, None], axis=1)  # (B, P, C)
        out = out + g * (wgt * valid.astype(masks.dtype))[:, :, None]
    return out.transpose(0, 2, 1)


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
