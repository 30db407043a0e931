"""Point sampling ops (PointRend-style).

Parity targets: /root/reference/modeling/modules/point_features.py
(point_sample :21, get_uncertain_point_coords_with_randomness :65) with
grid_sample align_corners=False semantics (pixel = coord * size - 0.5,
zero padding). All shapes static — point counts are fixed at trace time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class WideTable(NamedTuple):
    """Materialized shifted-stack of (N, H, W) maps for repeated sampling.

    ``wide[n, i, k]`` holds the flat map value at index ``i - pad + off_k``
    for tap offsets ``off = (0, 1, w, w+1)`` — the four bilinear taps of any
    point live in ONE row, so each sample is one gather row per point.

    Measured results (v5e, 40×1024² binary gt, 12544 pts): ISOLATED a
    shared bf16 table samples at 6.1 ms/layer vs 13.4 ms/layer rebuilt
    (scripts/bench_gt_sample.py), but COMPOSED into the criterion's
    10-layer losses phase the table LOSES (218.0 vs 173.4 ms,
    scripts/ab_gt_table.py) — XLA already CSEs the unmaterialized
    shifted-stack across layers and the optimization barrier breaks that.
    Hence this is opt-in (CriterionConfig.gt_table_dtype, default off);
    use it only for many samplings of one map OUTSIDE a context XLA can
    CSE (e.g. separate jit calls against a cached table)."""

    wide: jax.Array  # (n, span, 4)
    h: int
    w: int


def build_wide_table(masks: jax.Array, store_dtype=None) -> WideTable:
    """Build the shifted-stack table for (N, H, W) maps.

    ``store_dtype=jnp.bfloat16`` halves the gather bytes and is EXACT for
    binary {0,1} masks (both values representable); combined with
    :func:`point_sample_from_table`'s float32 weight math the sampled
    result is bit-identical to ``point_sample`` on float32 binary masks.
    An optimization barrier keeps the table materialized — without it XLA
    fuses the stack back into the gather and issues 4 rows per point."""
    n, h, w = masks.shape
    if store_dtype is not None:
        masks = masks.astype(store_dtype)
    flat = masks.reshape(n, h * w)
    pad = w + 1
    span = h * w + w + 1
    padded = jnp.pad(flat, ((0, 0), (pad, pad)))
    wide = jnp.stack(
        [padded[:, off : off + span] for off in (0, 1, w, w + 1)], axis=-1
    )
    return WideTable(jax.lax.optimization_barrier(wide), h, w)


def point_sample_from_table(
    table: WideTable, coords: jax.Array, compute_dtype=jnp.float32
) -> jax.Array:
    """Bilinear sample from a prebuilt :class:`WideTable` at (N, P, 2) xy
    coords in [0, 1]; returns (N, P) in ``compute_dtype``. Gathered taps are
    upcast BEFORE weighting, so bf16 storage of binary masks loses nothing.
    Semantics identical to :func:`point_sample` (grid_sample
    align_corners=False, zero padding)."""
    h, w = table.h, table.w
    span = table.wide.shape[1]
    pad = w + 1
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(compute_dtype)
    fy = (y - y0).astype(compute_dtype)
    base = y0.astype(jnp.int32) * w + x0.astype(jnp.int32) + pad
    base = jnp.clip(base, 0, span - 1)
    g4 = jnp.take_along_axis(table.wide, base[:, :, None], axis=1).astype(
        compute_dtype
    )  # (n, P, 4)
    out = jnp.zeros(coords.shape[:-1], compute_dtype)
    one = jnp.ones((), compute_dtype)
    for k, (dy, dx, wgt) in enumerate((
        (0, 0, (one - fy) * (one - fx)),
        (0, 1, (one - fy) * fx),
        (1, 0, fy * (one - fx)),
        (1, 1, fy * fx),
    )):
        xi = x0 + dx
        yi = y0 + dy
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        out = out + g4[..., k] * (wgt * valid.astype(compute_dtype))
    return out


def point_sample(masks: jax.Array, coords: jax.Array,
                 store_dtype=None) -> jax.Array:
    """Bilinear sample of (N, H, W) maps at (N, P, 2) xy coords in [0, 1].
    Returns (N, P).

    ``store_dtype``: optional narrower dtype for the gathered TABLE only
    (tap weights and the weighted sum stay in ``masks.dtype``) — halves
    the gather row bytes. BIT-EXACT when mask values are exactly
    representable in ``store_dtype`` (binary gt in bf16: v5e gt-side
    12.28 -> 9.93 ms isolated, scripts/bench_gt_sample_r5.py).

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
    padded = jnp.pad(
        flat if store_dtype is None else flat.astype(store_dtype),
        ((0, 0), (pad, pad)))
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
    if store_dtype is not None:
        g4 = g4.astype(masks.dtype)

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


def _tap_weights(h: int, w: int, x, y, dtype):
    """Per-tap bilinear weights with zero-padding validity and the wide-table
    base row — the exact math of point_sample's gather side."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    pad = w + 1
    span = h * w + w + 1
    base = jnp.clip(
        y0.astype(jnp.int32) * w + x0.astype(jnp.int32) + pad, 0, span - 1
    )
    wgts = []
    for dy, dx, wgt in (
        (0, 0, (1 - fy) * (1 - fx)),
        (0, 1, (1 - fy) * fx),
        (1, 0, fy * (1 - fx)),
        (1, 1, fy * fx),
    ):
        xi = x0 + dx
        yi = y0 + dy
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        wgts.append(wgt * valid.astype(dtype))
    return base, jnp.stack(wgts, axis=-1), pad, span


@jax.custom_vjp
def point_sample_trainable(masks: jax.Array, coords: jax.Array) -> jax.Array:
    """:func:`point_sample` with a Pallas-backed backward for d_masks.

    Identical forward. The VJP scatter of the plain implementation lowers
    to a ~25M rows/s XLA scatter (the composed criterion's largest backward
    item — 204 ms over 10 layers at B=2); the custom backward runs the
    VMEM-accumulator tap scatter (ops/pallas/tap_scatter, 2.6x faster) and
    folds the tap planes with shifted slices. coords get a zero cotangent —
    every caller samples at stop-gradient/random coords (the reference
    detaches them too, point_features.py:65-107)."""
    return point_sample(masks, coords)


def _pst_fwd(masks, coords):
    return point_sample(masks, coords), (masks, coords)


def _pst_bwd(res, g):
    masks, coords = res
    n, h, w = masks.shape
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    base, wgts, pad, span = _tap_weights(h, w, x, y, masks.dtype)
    rows = g[..., None].astype(jnp.float32) * wgts  # (N, P, 4)
    if jax.default_backend() == "tpu":
        from .pallas.tap_scatter import tap_scatter

        acc = tap_scatter(base, rows, span)  # (N, span, 4)
    else:
        flat_idx = (base + jnp.arange(n, dtype=jnp.int32)[:, None] * span
                    ).reshape(-1)
        acc = (
            jnp.zeros((n * span, 4), jnp.float32)
            .at[flat_idx].add(rows.reshape(-1, 4))
            .reshape(n, span, 4)
        )
    # Tap k at wide row i contributes to flat cell i + off_k - pad, so
    # d_flat[c] = sum_k acc[c + pad - off_k, k] — four static slices
    # (pad - off_k in [0, pad], and the slice windows stay inside span).
    d_flat = None
    for k, off in enumerate((0, 1, w, w + 1)):
        s = pad - off
        piece = acc[:, s : s + h * w, k]
        d_flat = piece if d_flat is None else d_flat + piece
    return d_flat.reshape(n, h, w).astype(masks.dtype), jnp.zeros_like(coords)


point_sample_trainable.defvjp(_pst_fwd, _pst_bwd)


def point_sample_shared(masks: jax.Array, coords: jax.Array,
                        store_dtype=None) -> jax.Array:
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
    if store_dtype is not None:
        # narrower gather table only (exact for binary gt; see point_sample)
        flat = flat.astype(store_dtype)
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
        out = out + g.astype(masks.dtype) * (
            wgt * valid.astype(masks.dtype))[:, :, None]
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
