"""Multi-scale deformable attention — the TPU-native replacement for the
reference's CUDA extension (SURVEY.md §2.8).

The reference implements this as an im2col CUDA kernel
(/root/reference/modeling/vision/encoder/ops/src/cuda/ms_deform_im2col_cuda.cuh)
with a grid_sample-based PyTorch fallback
(ops/functions/ms_deform_attn_func.py:52-72). Here the core is expressed as
batched gathers + weighted reductions that XLA maps to TPU gather/VPU ops:
per level, a 4-tap bilinear gather at predicted sampling locations
(grid_sample align_corners=False, zero padding semantics: pixel coordinate
= loc * size - 0.5), weighted by softmaxed attention weights and summed over
(levels x points). The fast path is ``impl='wide'`` (all four bilinear
taps packed into one gather row — see ms_deform_attn_core); the plain
4-tap XLA version is the correctness oracle, mirroring the reference's
fallback-as-oracle test strategy (ops/test.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def ms_deform_attn_core(
    value: jax.Array,  # (B, S, heads, d) — levels concatenated along S
    spatial_shapes: Sequence[tuple[int, int]],  # static [(H, W), ...]
    sampling_locations: jax.Array,  # (B, Lq, heads, L, P, 2) in [0, 1]
    attention_weights: jax.Array,  # (B, Lq, heads, L, P), softmaxed
    impl: str = "xla",
) -> jax.Array:
    """Returns (B, Lq, heads * d).

    Implementations:
    - 'xla'      : 4-tap take_along_axis + VPU weighted reduce — the
                   correctness oracle.
    - 'wide'     : THE fast path. The TPU HLO gather is row-rate bound
                   (measured v5e: ~127M rows/s fp32 regardless of row
                   width up to ~512B), so all 4 bilinear taps are packed
                   into ONE row of a shifted-concat value map
                   [v, v>>1x, v>>1y, v>>1xy] -> 4x fewer gather rows.
                   Measured on res3-like shapes (scripts/bench_gather.py):
                   21.6 ms (tap4 fp32) -> 13.6 ms (wide fp32) -> 8.9 ms
                   (wide bf16), a 2.4x gather win incl. the concat build.
                   Plus a flat 2-D gather lowering (collapsed batch
                   dims): 8.58 -> 3.69 ms per tap-set. End-to-end (v5e,
                   1024^2 bf16 evaluate_seg): 587.7 -> 171.5 ms/img =
                   3.43x; panoptic eval 1.7 -> 5.93 img/s.
    - 'xla_patch': (2, 2, d) window lax.gather — measured SLOWER (kept as
                   a documented dead end).

    Pallas note: vector gathers don't lower inside Pallas TPU kernels and
    per-point DMAs are latency-bound (round-1 notes). The round-2 one-hot
    matmul kernel ('hybrid', ops/pallas/onehot_gather.py) replaces the res5
    gather with VPU compares + MXU matmuls and wins in isolation (6.94 ->
    4.60 ms) but regresses composed into the 3-level layer (22 -> 27
    ms/layer) — kept selectable, oracle-tested, not default. 'wide' attacks
    the real bottleneck (gather row issue rate) directly in XLA.
    """
    if impl == "auto":
        # Two alternatives win ISOLATED but lose COMPOSED into the model
        # (both kept selectable, oracle + grad tested):
        # - 'hybrid' (Pallas one-hot matmul for small levels): res5 6.94 ->
        #   4.60 ms isolated, 22.0 -> 27.0 ms/layer composed.
        # - 'scan' (per-level gathers as lax.scan steps over stacked padded
        #   maps): 247M vs 72M rows/s on UNIFORM-random 688k-row gathers
        #   (scripts/bench_gather_scanlen.py — the while-loop lowering
        #   stages the operand and pipelines the gather), but evaluate_seg
        #   155.9 -> 193.3 ms composed (scripts/bench_msdeform_impl.py):
        #   real sampling locations are reference-point-local, so the flat
        #   gather already runs far above its uniform-random rate while the
        #   scan pays stack/pad materialization and loses fusion with the
        #   weighted reduce.
        # Batch > 1 (training shapes) routes to 'flat' (round 4): per-image
        # gathers stay on the fast gather path, and the hand-written VJP
        # avoids XLA autodiff's 6-D relayouts and bf16 scatters (see
        # _flat_level). B=1 serving keeps the measured-optimal 'wide'.
        impl = "flat" if value.shape[0] > 1 else "wide"
    if impl == "flat":
        return _ms_deform_attn_flat(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl == "scan":
        return _ms_deform_attn_scan(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl in ("fused", "fused_q", "wide_q"):
        # Row-order / call-count experiments on the wide formulation (exact
        # same math; see _ms_deform_attn_fused). BOTH ARE MEASURED NEGATIVE
        # RESULTS (v5e 1024^2 bf16 evaluate_seg, scripts/bench_msdeform_impl
        # .py wide wide_q fused fused_q):
        # - '*_q'   : q-minor gather row order — consecutive rows follow the
        #             query raster at fixed (head, point), near-sequential
        #             addresses. 155.8 -> 282.5 ms: the ~1-pixel row stride
        #             serializes on the same HBM channel/bank, while the
        #             default p-minor order keeps 4 independent
        #             neighborhoods in flight per query.
        # - 'fused*': ONE gather call over all levels' wide maps
        #             concatenated row-wise (3x fewer gather dispatches).
        #             155.8 -> 180.7 ms: the row-concat materializes 4x the
        #             value tensor and the merged gather loses per-level
        #             fusion with the weighted reduce.
        # Kept selectable + oracle/grad-tested; 'auto' stays on 'wide'.
        return _ms_deform_attn_fused(
            value, spatial_shapes, sampling_locations, attention_weights,
            qminor=impl.endswith("_q"), fused=impl.startswith("fused"),
        )
    if impl == "hybrid":
        # wide gather for large levels + Pallas one-hot matmul for levels
        # whose table fits VMEM (ops/pallas/onehot_gather.py): replaces the
        # issue-rate-bound HBM gather with VPU compares + MXU matmuls.
        return _ms_deform_attn_xla(
            value, spatial_shapes, sampling_locations, attention_weights,
            wide=True, onehot_max_cells=1536,
        )
    if impl in ("wide", "pallas"):  # 'pallas' config value maps to fast path
        return _ms_deform_attn_xla(
            value, spatial_shapes, sampling_locations, attention_weights,
            wide=True,
        )
    return _ms_deform_attn_xla(
        value, spatial_shapes, sampling_locations, attention_weights,
        patch=(impl == "xla_patch"),
    )


def _bilinear_gather(v_flat, h, w, x, y):
    """4-tap bilinear sample with zero padding.

    v_flat: (B, heads, HW, d); x, y: (B, heads, Lq, P) pixel coords.
    Returns (B, heads, Lq, P, d).

    Perf note (v5e, profiled): these gathers dominate evaluate_seg —
    2.75M 128-byte rows per level at ~123M rows/s on the TPU gather path
    (~5.6 ms per tap-set, ~400 ms/model at 1024^2). Measured alternatives,
    all WORSE: merging taps into one gather + barriers (586 -> 665 ms,
    extra materialized intermediate), (2,2,d) patch lax.gather with 4x
    fewer rows ('xla_patch': 586 -> 1009 ms — multi-dim window gathers
    lower slower still). Heads sample at different locations, so rows
    cannot be widened past 64 channels per tap — but the 4 taps of one
    point CAN share a row, which is what 'wide' does (the round-2 fix).
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    out = None
    for dy, dx, wgt in (
        (0, 0, (1 - fy) * (1 - fx)),
        (0, 1, (1 - fy) * fx),
        (1, 0, fy * (1 - fx)),
        (1, 1, fy * fx),
    ):
        xi = x0 + dx
        yi = y0 + dy
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yi_c * w + xi_c  # (B, heads, Lq, P)
        b, nh, lq, p = idx.shape
        flat_idx = idx.reshape(b, nh, lq * p, 1)
        g = jnp.take_along_axis(v_flat, flat_idx, axis=2)  # (B, nh, Lq*P, d)
        g = g.reshape(b, nh, lq, p, -1)
        contrib = g * (wgt * valid.astype(g.dtype))[..., None]
        out = contrib if out is None else out + contrib
    return out


def _bilinear_gather_patch(v_map, h, w, x, y):
    """Patch-gather variant: ONE lax.gather fetching a (2, 2, d) window per
    sampling point (4x fewer gather rows than per-tap take_along_axis).
    v_map: (BH, h, w, d); x, y: (BH, L) pixel coords. Returns (BH, L, d)."""
    bh, l = x.shape
    d = v_map.shape[-1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(v_map.dtype)
    fy = (y - y0).astype(v_map.dtype)

    ys = jnp.clip(y0, 0, h - 2).astype(jnp.int32)
    xs = jnp.clip(x0, 0, w - 2).astype(jnp.int32)
    starts = jnp.stack([ys, xs], axis=-1)  # (BH, L, 2)

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patches = jax.lax.gather(
        v_map, starts, dn, slice_sizes=(1, 2, 2, d),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (BH, L, 2, 2, d) — wait: offset dims give (1,2,2,d); batching keeps BH
    patches = patches.reshape(bh, l, 2, 2, d)

    # Positions of the true taps inside the clipped patch.
    py = (y0 - ys).astype(jnp.int32)  # 0 normally; 1 when y0 == h-1; -1 when y0 < 0
    px = (x0 - xs).astype(jnp.int32)

    def tap(dy, dx):
        iy = jnp.clip(py + dy, 0, 1)
        ix = jnp.clip(px + dx, 0, 1)
        sel = jnp.take_along_axis(
            patches.reshape(bh, l, 4, d),
            (iy * 2 + ix)[..., None, None].astype(jnp.int32), axis=2,
        )[:, :, 0]
        valid = (
            (x0 + dx >= 0) & (x0 + dx <= w - 1)
            & (y0 + dy >= 0) & (y0 + dy <= h - 1)
        ).astype(v_map.dtype)
        return sel, valid

    g00, v00 = tap(0, 0)
    g01, v01 = tap(0, 1)
    g10, v10 = tap(1, 0)
    g11, v11 = tap(1, 1)
    w00 = ((1 - fy) * (1 - fx) * v00)[..., None]
    w01 = ((1 - fy) * fx * v01)[..., None]
    w10 = (fy * (1 - fx) * v10)[..., None]
    w11 = (fy * fx * v11)[..., None]
    return g00 * w00 + g01 * w01 + g10 * w10 + g11 * w11


def _bilinear_gather_wide(v_flat, h, w, x, y):
    """All-taps-in-one-row bilinear sample (the measured fast path).

    Builds v4 = [v, v_right, v_down, v_downright] (B, heads, HW, 4d) with
    rolls along the flattened HW axis (wrapped rows only ever correspond to
    taps whose zero-padding weight is 0), then ONE gather at the clipped
    top-left tap index fetches all four taps. Per-slot weights account for
    index clipping at the borders (slot k holds pixel (y0c+ky, x0c+kx);
    the true tap (y0+dy, x0+dx) lands at slot (dy+py, dx+px) with
    px = x0c - x0 in {0, 1}).

    v_flat: (B, heads, HW, d); x, y: (B, heads, Lq, P) pixel coords.
    Returns (B, heads, Lq, P, d).
    """
    d = v_flat.shape[-1]
    v4 = jnp.concatenate(
        [
            v_flat,
            jnp.roll(v_flat, -1, axis=2),
            jnp.roll(v_flat, -w, axis=2),
            jnp.roll(v_flat, -(w + 1), axis=2),
        ],
        axis=-1,
    )
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(v_flat.dtype)
    fy = (y - y0).astype(v_flat.dtype)
    x0c = jnp.clip(x0, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    px = (x0c - x0).astype(v_flat.dtype)  # 1 iff x0 == -1
    py = (y0c - y0).astype(v_flat.dtype)

    idx = (y0c * w + x0c).astype(jnp.int32)
    b, nh, lq, p = idx.shape
    # Flat 2-D gather: collapsing the (B, heads) batching dims into the row
    # index lowers to a ~2.3x faster HLO gather path than the batched
    # take_along_axis (measured v5e: 8.58 -> 3.69 ms, 186M rows/s, on
    # res3-like shapes — scripts/bench_gather.py variants).
    #
    # Batch UNROLL (round 4): one flat gather over the whole batch falls off
    # the fast gather path once the operand crosses ~100 MB — measured 79M
    # rows/s for one B=2 res3 gather vs 251M rows/s as two per-image gathers
    # (scripts/bench_gather_bsplit.py; this is the 'batch-2 eval cliff' of
    # ROADMAP r2). Per-image gathers also make the autodiff d_value
    # scatter-adds per-image. B is static, so the Python loop unrolls.
    hw = h * w
    base = (
        jax.lax.broadcasted_iota(jnp.int32, (1, nh, lq, p), 0) * 0
        + jax.lax.broadcasted_iota(jnp.int32, (1, nh, lq, p), 1) * hw
    )
    if b == 1:
        flat_idx = (base + idx).reshape(-1)
        g = jnp.take(
            v4.reshape(nh * hw, 4 * d), flat_idx, axis=0, mode="clip"
        ).reshape(b, nh, lq, p, 4, d)
    else:
        per_img = []
        v4r = v4.reshape(b, nh * hw, 4 * d)
        for i in range(b):
            fi = (base + idx[i : i + 1]).reshape(-1)
            per_img.append(jnp.take(v4r[i], fi, axis=0, mode="clip"))
        g = jnp.stack(per_img).reshape(b, nh, lq, p, 4, d)

    # Tap weights with zero-padding validity (locations may be far out of
    # bounds — predicted offsets are unconstrained — so check both sides).
    def _in(lo, hi, t):
        return ((t >= lo) & (t <= hi)).astype(v_flat.dtype)

    wx0 = (1.0 - fx) * _in(0, w - 1, x0)
    wx1 = fx * _in(0, w - 1, x0 + 1)
    wy0 = (1.0 - fy) * _in(0, h - 1, y0)
    wy1 = fy * _in(0, h - 1, y0 + 1)
    # Slot weights after the clip shift.
    sx0 = jnp.where(px > 0, wx1, wx0)
    sx1 = jnp.where(px > 0, 0.0, wx1)
    sy0 = jnp.where(py > 0, wy1, wy0)
    sy1 = jnp.where(py > 0, 0.0, wy1)
    wslot = jnp.stack(
        [sy0 * sx0, sy0 * sx1, sy1 * sx0, sy1 * sx1], axis=-1
    )  # (B, nh, Lq, P, 4)
    return (g * wslot[..., None]).sum(axis=4)


def _wide_idx_wslot(v_dtype, h, w, x, y):
    """Shared index/slot-weight math of the wide formulation: returns
    (top-left flat index (clipped), per-slot bilinear weights with
    zero-padding validity) — see _bilinear_gather_wide."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(jnp.float32)
    fy = (y - y0).astype(jnp.float32)
    x0c = jnp.clip(x0, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    px = (x0c - x0).astype(jnp.float32)
    py = (y0c - y0).astype(jnp.float32)
    idx = (y0c * w + x0c).astype(jnp.int32)

    def _in(lo, hi, t):
        return ((t >= lo) & (t <= hi)).astype(jnp.float32)

    wx0 = (1.0 - fx) * _in(0, w - 1, x0)
    wx1 = fx * _in(0, w - 1, x0 + 1)
    wy0 = (1.0 - fy) * _in(0, h - 1, y0)
    wy1 = fy * _in(0, h - 1, y0 + 1)
    sx0 = jnp.where(px > 0, wx1, wx0)
    sx1 = jnp.where(px > 0, 0.0, wx1)
    sy0 = jnp.where(py > 0, wy1, wy0)
    sy1 = jnp.where(py > 0, 0.0, wy1)
    wslot = jnp.stack(
        [sy0 * sx0, sy0 * sx1, sy1 * sx0, sy1 * sx1], axis=-1
    )  # (..., 4)
    return idx, wslot


def _wide_map(v_flat, w):
    """Shifted-concat value map [v, v>>1x, v>>1y, v>>1xy] (B, nh, HW, 4d)."""
    return jnp.concatenate(
        [
            v_flat,
            jnp.roll(v_flat, -1, axis=2),
            jnp.roll(v_flat, -w, axis=2),
            jnp.roll(v_flat, -(w + 1), axis=2),
        ],
        axis=-1,
    )


def _level_contribution_wide_xla(v_l, hl, wl, x, y, aw_l):
    """(sampled * aw).sum(points) via the wide gather — backward oracle
    for the one-hot kernel."""
    sampled = _bilinear_gather_wide(v_l, hl, wl, x, y)
    return (sampled * aw_l[..., None]).sum(axis=3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _level_contribution_onehot(v_l, hl, wl, x, y, aw_l):
    """Per-level deformable contribution via the Pallas one-hot kernel.
    v_l (B, nh, HW, d); x/y/aw_l (B, nh, Lq, P). Returns (B, nh, Lq, d)."""
    from .pallas.onehot_gather import onehot_deform_level_forward

    b, nh, hw, d = v_l.shape
    lq, p = x.shape[2], x.shape[3]
    idx, wslot = _wide_idx_wslot(v_l.dtype, hl, wl, x, y)
    wslot = wslot * aw_l.astype(jnp.float32)[..., None]  # fold attention wgt
    v4 = _wide_map(v_l, wl).reshape(b * nh, hw, 4 * d)
    out = onehot_deform_level_forward(
        v4,
        idx.reshape(b * nh, lq, p),
        wslot.transpose(0, 1, 2, 4, 3).reshape(b * nh, lq, 4, p),
        n_points=p,
    )
    return out.reshape(b, nh, lq, d)


def _level_onehot_fwd(v_l, hl, wl, x, y, aw_l):
    return _level_contribution_onehot(v_l, hl, wl, x, y, aw_l), (v_l, x, y, aw_l)


def _level_onehot_bwd(hl, wl, res, g):
    v_l, x, y, aw_l = res
    out, vjp = jax.vjp(
        lambda v, xx, yy, aw: _level_contribution_wide_xla(v, hl, wl, xx, yy, aw),
        v_l, x, y, aw_l,
    )
    # The oracle may accumulate in a wider dtype than the kernel's primal
    # output (e.g. fp32 attention weights x bf16 values); align the cotangent
    # dtypes on both sides so custom_vjp's exact-dtype contract holds.
    dv, dx, dy, daw = vjp(g.astype(out.dtype))
    return (
        dv.astype(v_l.dtype),
        dx.astype(x.dtype),
        dy.astype(y.dtype),
        daw.astype(aw_l.dtype),
    )


_level_contribution_onehot.defvjp(_level_onehot_fwd, _level_onehot_bwd)


@functools.lru_cache(maxsize=None)
def _flat_selectors(d: int, p: int):
    """Static selector matrices for the flat-layout core (see
    _ms_deform_attn_flat): reductions and broadcasts over (P, slot, d)
    become small constant matmuls on the MXU instead of 6-D reshapes."""
    import numpy as _np

    # (4, 4d): slot s -> lanes [s*d, (s+1)*d)
    m_expand = _np.zeros((4, 4 * d), _np.float32)
    for s in range(4):
        m_expand[s, s * d:(s + 1) * d] = 1.0
    # (d, 4d): feature d' -> same lane in all four slots
    m_tile = _np.tile(_np.eye(d, dtype=_np.float32), (1, 4))
    # (4d, 4): lane-group sum
    m_slot = m_expand.T.copy()
    # (p*4d, d): sum over p rows-in-lane-space and slots onto d lanes
    m_out = _np.tile(m_tile.T, (p, 1))
    # big-row variants ((q, p*4d) layout — one row per query):
    # (d, p*4d): feature -> same lane in all p*4 slots
    m_tile_big = _np.tile(_np.eye(d, dtype=_np.float32), (1, 4 * p))
    # (p*4, p*4d): (p, slot) pair -> its d-lane group
    m_expand_big = _np.zeros((p * 4, p * 4 * d), _np.float32)
    for ps in range(p * 4):
        m_expand_big[ps, ps * d:(ps + 1) * d] = 1.0
    # (p*4d, 128): lane-group sums in the first p*4 columns, zero-padded to
    # a full 128-lane output tile (a p*4=16-lane matmul output forces XLA
    # into relayouts; padded columns are free on the MXU)
    m_slot_big = _np.zeros((p * 4 * d, 128), _np.float32)
    m_slot_big[:, : p * 4] = m_expand_big.T
    # numpy in the cache (jnp arrays created under a trace would leak
    # tracers); jnp.asarray at the call site constant-folds in XLA.
    return m_expand, m_tile, m_slot, m_out, m_tile_big, m_expand_big, m_slot_big


def _flat_gather_rows(v4_i, idx_i):
    """(nh*hw, 4d) map, (R,) indices -> (R, 4d) rows."""
    return jnp.take(v4_i, idx_i, axis=0, mode="clip")


def _use_perhead():
    import os
    return os.environ.get("IUVL_PERHEAD_DEFORM", "0") == "1"


def _flat_gather_rows_perhead(v4_i, idx, nh, hw):
    """Per-head unrolled gathers: v4_i (nh*hw, 4d), idx (nh, lq, p) WITHOUT
    head bases. Each head's operand is hw*4d bytes (res3 bf16: 8.4 MB) —
    small enough for the scheduler's scoped-VMEM prefetch, where the whole
    (nh*hw, 4d) map (67 MB) is not (composed HBM-operand gathers run 85M
    rows/s vs 313M from VMEM; see ROADMAP r5). Row order preserved
    (head-major), so downstream reductions are unchanged."""
    lq, p = idx.shape[1], idx.shape[2]
    outs = []
    for h in range(nh):
        outs.append(jnp.take(
            jax.lax.slice_in_dim(v4_i, h * hw, (h + 1) * hw, axis=0),
            idx[h].reshape(lq * p), axis=0, mode="clip"))
    return jnp.concatenate(outs, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _flat_level(v_l, hl, wl, x, y, aw_l):
    """Per-level deformable contribution in FLAT row layout with a manual
    VJP (round 4). v_l (B, nh, HW, d) bf16/f32; x, y, aw_l (B, nh, Lq, P).
    Returns (B, nh, Lq, d) fp32.

    Why this exists: XLA's autodiff of the wide gather runs its backward in
    (B, nh, Lq, P, 4, d) 6-D layouts — profiled at B=2 1024^2 (ROADMAP r4):
    ~250 ms of physical reshapes T(8,128)<->T(4,128), ~330 ms of
    half-throughput d=64-minor VPU chains, and bf16 scatter-adds running 3x
    slower than f32 ones. Here forward AND backward keep every large tensor
    in (rows, 4d) layout (the gather/scatter-native shape), turn the
    (P, slot, d) reductions/broadcasts into constant selector matmuls, run
    the d_value scatter in f32, and unroll the batch (one flat gather per
    image stays on XLA's fast gather path — scripts/bench_gather_bsplit.py:
    79 -> 251M rows/s).
    """
    out, _ = _flat_level_fwd_impl(v_l, hl, wl, x, y, aw_l)
    return out


def _flat_level_fwd_impl(v_l, hl, wl, x, y, aw_l):
    b, nh, hw, d = v_l.shape
    lq, p = x.shape[2], x.shape[3]
    r = nh * lq * p
    sel = _flat_selectors(d, p)
    m_expand, m_out = jnp.asarray(sel[0]), jnp.asarray(sel[3])
    idx, wslot = _wide_idx_wslot(v_l.dtype, hl, wl, x, y)
    wa = wslot * aw_l.astype(jnp.float32)[..., None]      # (B, nh, Lq, P, 4)
    base = jax.lax.broadcasted_iota(jnp.int32, (nh, lq, p), 0) * hw
    v4 = _wide_map(v_l, wl)                               # (B, nh, HW, 4d)
    perhead = _use_perhead()
    outs = []
    for i in range(b):
        idx_i = (base + idx[i]).reshape(r)
        if perhead:
            g4 = _flat_gather_rows_perhead(
                v4[i].reshape(nh * hw, 4 * d), idx[i], nh, hw)
        else:
            g4 = _flat_gather_rows(v4[i].reshape(nh * hw, 4 * d), idx_i)
        waexp = jnp.dot(wa[i].reshape(r, 4), m_expand,
                        preferred_element_type=jnp.float32)  # (R, 4d)
        prod = g4.astype(jnp.float32) * waexp
        o = jnp.dot(prod.reshape(nh * lq, p * 4 * d), m_out,
                    preferred_element_type=jnp.float32)      # (nh*Lq, d)
        outs.append(o.reshape(nh, lq, d))
    return jnp.stack(outs), (idx, wa, base)


def _flat_level_fwd(v_l, hl, wl, x, y, aw_l):
    out, _ = _flat_level_fwd_impl(v_l, hl, wl, x, y, aw_l)
    return out, (v_l, x, y, aw_l)


def _flat_level_bwd(hl, wl, res, gout):
    v_l, x, y, aw_l = res
    b, nh, hw, d = v_l.shape
    lq, p = x.shape[2], x.shape[3]
    r = nh * lq * p
    f32 = jnp.float32
    # NOTE measured NEGATIVE variant (v5e, B=2 1024^2 composed pix_grad):
    # replacing the jnp.repeat cotangent tiling + (4d, 4) lane-group dots
    # below with "big-row" (nh*Lq, p*4d) selector MATMULS (m_tile_big /
    # m_expand_big / 128-padded m_slot_big) measured 1248 -> 1352 ms — the
    # fp32 selector matmuls write 700 MB intermediates that the
    # repeat/broadcast path streams. Selectors kept in _flat_selectors for
    # reference; this is the measured-faster formulation.
    sel = _flat_selectors(d, p)
    m_expand, m_tile, m_slot = (jnp.asarray(m) for m in sel[:3])

    import os as _os
    # wslot rebuilt cheaply; its (x, y) VJP via autodiff of the pure
    # elementwise builder (exact, no manual derivative math). idx is
    # integer (non-differentiable) — keep it out of the vjp closure.
    # IUVL_FLAT_WSLOT=1 runs the whole wslot/aw chain per-image in flat
    # (R,)/(R, 4) layout instead of the 5-D (B, nh, Lq, P, 4) one (the 5-D
    # elementwise chains show as T(4,128)/T(8,128) relayout "data
    # formatting" in the trace).
    flat_wslot = _os.environ.get("IUVL_FLAT_WSLOT", "0") == "1"
    idx = _wide_idx_wslot(v_l.dtype, hl, wl, x, y)[0]
    aw32 = aw_l.astype(f32)
    if not flat_wslot:
        wslot, wslot_vjp = jax.vjp(
            lambda xx, yy: _wide_idx_wslot(v_l.dtype, hl, wl, xx, yy)[1],
            x, y)
        wa = wslot * aw32[..., None]
    base = jax.lax.broadcasted_iota(jnp.int32, (nh, lq, p), 0) * hw
    v4 = _wide_map(v_l, wl)
    use_glue_kernel = (
        jax.default_backend() == "tpu" and (nh * lq) % 8 == 0
    )
    perhead = _use_perhead()
    dwa_imgs, dv4_imgs = [], []
    dx_imgs, dy_imgs, daw_imgs = [], [], []
    for i in range(b):
        idx_i = (base + idx[i]).reshape(r)
        if flat_wslot:
            xi = x[i].reshape(r)
            yi = y[i].reshape(r)
            wslot_i, vjp_i = jax.vjp(
                lambda xx, yy: _wide_idx_wslot(
                    v_l.dtype, hl, wl, xx, yy)[1], xi, yi)
            aw_i = aw32[i].reshape(r)
            wa_i = wslot_i * aw_i[:, None]
        else:
            wa_i = wa[i].reshape(r, 4)
        if perhead:
            g4 = _flat_gather_rows_perhead(
                v4[i].reshape(nh * hw, 4 * d), idx[i], nh, hw)
        else:
            g4 = _flat_gather_rows(v4[i].reshape(nh * hw, 4 * d), idx_i)
        if use_glue_kernel:
            # One fused pass builds the scatter rows + per-slot dots with
            # the tiled cotangent living only in VMEM (the XLA formulation
            # below materializes it at f32 — ~700 MB per level-image);
            # contrib comes back in the value dtype and the f32 convert
            # fuses into the scatter.
            from .pallas.deform_bwd_glue import (
                deform_bwd_glue, deform_bwd_glue_q,
            )

            # Query-row glue kernel (round-5 default): rows viewed as
            # (q, p*4d) — a pure bitcast — so the cotangent tiling is a
            # lane concatenate instead of a sublane row-broadcast; composed
            # B=2 pix_grad 885.8 -> 860.2 ms. Bit-exact vs the row-layout
            # kernel (tests/test_ops_parity.py glue cases).
            glue = (deform_bwd_glue if _os.environ.get(
                "IUVL_GLUE_Q", "1") == "0" else deform_bwd_glue_q)
            contrib, dots = glue(
                g4, gout[i].reshape(nh * lq, d), wa_i, x.shape[3],
            )
        else:
            # cotangent rows: gout (nh*Lq, d) -> tiled lanes -> P-repeats
            gt = jnp.dot(gout[i].reshape(nh * lq, d).astype(f32), m_tile,
                         preferred_element_type=f32)        # (nh*Lq, 4d)
            gt_rows = jnp.repeat(gt, p, axis=0)             # (R, 4d) f32
            # d_wa (per slot): rowwise dots via lane-group-sum matmul
            dots = jnp.dot(g4.astype(f32) * gt_rows, m_slot,
                           preferred_element_type=f32)      # (R, 4)
            waexp = jnp.dot(wa_i, m_expand,
                            preferred_element_type=f32)
            contrib = waexp * gt_rows                       # (R, 4d) f32
        if flat_wslot:
            daw_imgs.append(
                (dots * wslot_i).sum(-1).reshape(nh, lq, p))
            dxi, dyi = vjp_i(dots * aw_i[:, None])
            dx_imgs.append(dxi.reshape(nh, lq, p))
            dy_imgs.append(dyi.reshape(nh, lq, p))
        else:
            dwa_imgs.append(dots)
        # d_v4 rows, scattered in f32 (bf16 scatter-add measures 3x slower).
        # MEASURED NEGATIVE composed (round 5, kept opt-in via
        # IUVL_SORTED_DV_SCATTER=1): explicitly argsort-ing the rows and
        # passing indices_are_sorted wins ISOLATED 2x (XLA's internal
        # sorted-apply runs 45M rows/s vs 106M hinted; res3 15.4 -> 7.3 ms
        # end-to-end, scripts/bench_dv_scatter.py) but LOSES ~200 ms in the
        # composed B=2 pixel-decoder backward at every remat/scoped-vmem
        # setting (scripts/ab_pixgrad_r5.py: rg2:49152 981.8 unsorted vs
        # 1124.1 sorted) — the extra materialized permute pass displaces
        # the scheduler's scoped-VMEM gather-operand prefetch, which is
        # worth more than the scatter win.

        if nh * hw >= 32768 and _os.environ.get(
                "IUVL_SORTED_DV_SCATTER", "0") == "1":
            order = jnp.argsort(idx_i)
            dv4_imgs.append(
                jnp.zeros((nh * hw, 4 * d), f32).at[idx_i[order]].add(
                    contrib[order].astype(f32), indices_are_sorted=True)
            )
        elif _os.environ.get("IUVL_PERHEAD_SCATTER", "1") == "1":
            # Per-head d_value scatter (round-5 DEFAULT): each destination
            # map is hw*4d f32 (res3: 16.8 MB — scoped-VMEM-stageable where
            # the 134 MB whole-map operand is not). Composed B=2 pix_grad
            # 898.8 -> 885.8 ms (scripts/ab_pixgrad_r5.py rg3:49152).
            # Per-head GATHERS measured the other way (974.3 ms — the
            # whole-map gather already wins scoped-VMEM placement and the
            # 8x dispatch split breaks it), so only the scatter splits.
            c3 = contrib.astype(f32).reshape(nh, lq * p, 4 * d)
            parts = [
                jnp.zeros((hw, 4 * d), f32).at[
                    idx[i][h].reshape(lq * p)].add(c3[h])
                for h in range(nh)
            ]
            dv4_imgs.append(jnp.concatenate(parts, axis=0))
        else:
            dv4_imgs.append(
                jnp.zeros((nh * hw, 4 * d), f32).at[idx_i].add(
                    contrib.astype(f32))
            )

    if flat_wslot:
        d_aw = jnp.stack(daw_imgs).astype(aw_l.dtype)
        d_x = jnp.stack(dx_imgs)
        d_y = jnp.stack(dy_imgs)
    else:
        dwa = jnp.stack(dwa_imgs).reshape(b, nh, lq, p, 4)
        d_aw = (dwa * wslot).sum(-1).astype(aw_l.dtype)
        d_wslot = dwa * aw32[..., None]
        d_x, d_y = wslot_vjp(d_wslot)
    # v4 = [v, v>>1x, v>>1y, v>>1xy] -> fold slot planes back with inverse
    # rolls (linear, exact transpose of _wide_map).
    dv4 = jnp.stack(dv4_imgs).reshape(b, nh, hw, 4 * d)
    d_v = (
        dv4[..., :d]
        + jnp.roll(dv4[..., d:2 * d], 1, axis=2)
        + jnp.roll(dv4[..., 2 * d:3 * d], wl, axis=2)
        + jnp.roll(dv4[..., 3 * d:], wl + 1, axis=2)
    )
    return (d_v.astype(v_l.dtype), d_x.astype(x.dtype), d_y.astype(y.dtype),
            d_aw)


_flat_level.defvjp(_flat_level_fwd, _flat_level_bwd)


def _ms_deform_attn_flat(value, spatial_shapes, sampling_locations,
                         attention_weights):
    """Flat-layout wide-gather deformable core (round 4): identical math to
    impl='wide' with the attention weight folded into the slot weights
    (associative over the p/slot axes, like the 'fused' variants), but all
    large tensors stay in gather-native (rows, 4d) layout and the backward
    is the hand-written _flat_level VJP."""
    b, s, nh, d = value.shape
    lq = sampling_locations.shape[1]
    level_sizes = [h * w for h, w in spatial_shapes]
    assert sum(level_sizes) == s, (spatial_shapes, s)
    v = value.transpose(0, 2, 1, 3)
    out = None
    start = 0
    for lvl, (hl, wl) in enumerate(spatial_shapes):
        v_l = jax.lax.slice_in_dim(v, start, start + hl * wl, axis=2)
        start += hl * wl
        loc = sampling_locations[:, :, :, lvl]
        x = loc[..., 0].transpose(0, 2, 1, 3) * wl - 0.5
        y = loc[..., 1].transpose(0, 2, 1, 3) * hl - 0.5
        aw = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)
        c = _flat_level(v_l, hl, wl, x, y, aw)
        out = c if out is None else out + c
    # stays fp32 like the 'wide' path (its level sum promotes to fp32)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, nh * d)


def _ms_deform_attn_fused(value, spatial_shapes, sampling_locations,
                          attention_weights, qminor: bool = False,
                          fused: bool = True):
    """Wide-formulation deformable sampling with reordered/merged gathers.

    Identical math to impl='wide' (same _wide_idx_wslot slot weights, same
    shifted-concat maps, attention weight folded into the slot weights —
    multiplication is associative over the p/slot axes); only the gather
    row ORDER and CALL COUNT differ:

    - qminor: per level the rows iterate (b, nh, P, Lq) instead of
      (b, nh, Lq, P). Deformable sampling locations are local to their
      reference points, and reference points follow the query raster, so
      at fixed (head, point) consecutive rows step ~one map pixel — i.e.
      near-sequential addresses in the wide map — instead of jumping
      between the 4 spread-out points of one query.
    - fused: all levels' wide maps are concatenated row-wise and served by
      ONE gather (per-level row-base offsets folded into the indices),
      3x fewer gather dispatches per deformable layer.
    """
    b, s, nh, d = value.shape
    lq = sampling_locations.shape[1]
    p = sampling_locations.shape[4]
    level_sizes = [h * w for h, w in spatial_shapes]
    assert sum(level_sizes) == s, (spatial_shapes, s)

    v = value.transpose(0, 2, 1, 3)  # (B, nh, S, d)
    ops, idxs, wts = [], [], []
    start = 0
    row_base = 0
    for lvl, (hl, wl) in enumerate(spatial_shapes):
        hw = hl * wl
        v_l = jax.lax.slice_in_dim(v, start, start + hw, axis=2)
        start += hw
        loc = sampling_locations[:, :, :, lvl]  # (B, Lq, nh, P, 2)
        if qminor:
            # (B, nh, P, Lq): query minor — raster-sequential row addresses.
            x = loc[..., 0].transpose(0, 2, 3, 1) * wl - 0.5
            y = loc[..., 1].transpose(0, 2, 3, 1) * hl - 0.5
            aw = attention_weights[:, :, :, lvl].transpose(0, 2, 3, 1)
        else:
            x = loc[..., 0].transpose(0, 2, 1, 3) * wl - 0.5
            y = loc[..., 1].transpose(0, 2, 1, 3) * hl - 0.5
            aw = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)
        idx, wslot = _wide_idx_wslot(v.dtype, hl, wl, x, y)
        base = (
            jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0) * (nh * hw)
            + jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1) * hw
            + (row_base if fused else 0)  # row offset only in the merged map
        )
        row_base += b * nh * hw
        ops.append(_wide_map(v_l, wl).reshape(b * nh * hw, 4 * d))
        idxs.append((base + idx).reshape(-1))
        wts.append(wslot * aw.astype(jnp.float32)[..., None])

    n_lvl = len(spatial_shapes)
    qp = (p, lq) if qminor else (lq, p)
    # g dims: (b, nh, qp[0], qp[1], 4 slots, d)
    paxis, slotaxis = (2, 4) if qminor else (3, 4)

    if fused:
        allv = jnp.concatenate(ops, axis=0)  # (b*nh*S, 4d)
        allidx = jnp.concatenate(idxs)
        g = jnp.take(allv, allidx, axis=0, mode="clip").reshape(
            n_lvl, b, nh, *qp, 4, d
        )
        wt = jnp.stack(wts)  # (L, b, nh, *qp, 4)
        out = (g.astype(jnp.float32) * wt[..., None]).sum(
            axis=(0, paxis + 1, slotaxis + 1)
        )
    else:
        out = None
        for op, ix, wt in zip(ops, idxs, wts):
            g = jnp.take(op, ix, axis=0, mode="clip").reshape(
                b, nh, *qp, 4, d
            )
            c = (g.astype(jnp.float32) * wt[..., None]).sum(
                axis=(paxis, slotaxis)
            )  # (b, nh, Lq, d)
            out = c if out is None else out + c
    out = out.astype(value.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, nh * d)


def _ms_deform_attn_scan(value, spatial_shapes, sampling_locations,
                         attention_weights):
    """Wide-formulation deformable sampling with the per-level gathers run
    as steps of ONE lax.scan over stacked (padded) per-level value maps.

    Identical math to impl='wide' (same _wide_idx_wslot slot weights, same
    shifted-concat maps); only the gather scheduling differs. Measured v5e
    (scripts/bench_gather_scanlen.py, res3-shaped 688k-row gathers, bf16):
    247M rows/s per scan step vs 72M rows/s for the same gather as a plain
    op on UNIFORM-RANDOM indices — the while-loop lowering dynamic-slices
    the step's operand out of the stacked buffer and pipelines the gather;
    the unrolled form doesn't.

    NEGATIVE RESULT composed into the model (scripts/bench_msdeform_impl.py,
    1024^2 bf16 evaluate_seg): 155.9 ('wide') -> 193.3 ms ('scan'). Real
    deformable sampling locations are local to their reference points, so
    the flat gather already runs far above its uniform-random rate, while
    this path pays the stack/pad materialization and loses fusion of the
    weighted reduce with the gather. Kept selectable for workloads with
    scattered access patterns; 'auto' stays on 'wide'.
    """
    b, s, nh, d = value.shape
    lq = sampling_locations.shape[1]
    p = sampling_locations.shape[4]
    level_sizes = [h * w for h, w in spatial_shapes]
    assert sum(level_sizes) == s, (spatial_shapes, s)
    hw_max = max(level_sizes)

    v = value.transpose(0, 2, 1, 3)  # (B, nh, S, d)
    ops, idxs, wts = [], [], []
    base = (
        jax.lax.broadcasted_iota(jnp.int32, (b, nh, lq, p), 0)
        * (nh * hw_max)
        + jax.lax.broadcasted_iota(jnp.int32, (b, nh, lq, p), 1) * hw_max
    )
    start = 0
    for lvl, (hl, wl) in enumerate(spatial_shapes):
        v_l = jax.lax.slice_in_dim(v, start, start + hl * wl, axis=2)
        start += hl * wl
        loc = sampling_locations[:, :, :, lvl]  # (B, Lq, nh, P, 2)
        x = loc[..., 0].transpose(0, 2, 1, 3) * wl - 0.5
        y = loc[..., 1].transpose(0, 2, 1, 3) * hl - 0.5
        aw = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)
        idx, wslot = _wide_idx_wslot(v.dtype, hl, wl, x, y)
        v4 = _wide_map(v_l, wl)  # (B, nh, HWl, 4d)
        pad = hw_max - hl * wl
        if pad:
            v4 = jnp.pad(v4, ((0, 0), (0, 0), (0, pad), (0, 0)))
        ops.append(v4.reshape(b * nh * hw_max, 4 * d))
        idxs.append((base + idx).reshape(-1))
        # Fold the attention weight into the slot weights (fp32), matching
        # the wide path's sampled*(wslot) then *aw contraction order —
        # multiplication is associative over the p/slot axes.
        wts.append(wslot * aw.astype(jnp.float32)[..., None])

    ops = jnp.stack(ops)    # (L, B*nh*hw_max, 4d)
    idxs = jnp.stack(idxs)  # (L, B*nh*Lq*P)
    wts = jnp.stack(wts)    # (L, B, nh, Lq, P, 4)

    def body(carry, inp):
        op, ix, wt = inp
        g = jnp.take(op, ix, axis=0, mode="clip").reshape(
            b, nh, lq, p, 4, d
        )
        contrib = (g.astype(jnp.float32) * wt[..., None]).sum(axis=(3, 4))
        return carry + contrib, None

    out, _ = jax.lax.scan(
        body, jnp.zeros((b, nh, lq, d), jnp.float32), (ops, idxs, wts)
    )
    out = out.astype(value.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, nh * d)


def _ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                        attention_weights, patch: bool = False,
                        wide: bool = False, onehot_max_cells: int = 0):
    b, s, nh, d = value.shape
    lq = sampling_locations.shape[1]
    p = sampling_locations.shape[4]
    level_sizes = [h * w for h, w in spatial_shapes]
    assert sum(level_sizes) == s, (spatial_shapes, s)

    # (B, heads, S, d) once, then per-level static slices.
    v = value.transpose(0, 2, 1, 3)
    out = jnp.zeros((b, nh, lq, d), dtype=value.dtype)
    start = 0
    for lvl, (hl, wl) in enumerate(spatial_shapes):
        v_l = jax.lax.slice_in_dim(v, start, start + hl * wl, axis=2)
        start += hl * wl
        loc = sampling_locations[:, :, :, lvl]  # (B, Lq, nh, P, 2)
        # grid_sample align_corners=False: pixel = loc * size - 0.5
        x = loc[..., 0].transpose(0, 2, 1, 3) * wl - 0.5  # (B, nh, Lq, P)
        y = loc[..., 1].transpose(0, 2, 1, 3) * hl - 0.5
        w_l = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)
        if wide and 0 < hl * wl <= onehot_max_cells:
            out = out + _level_contribution_onehot(v_l, hl, wl, x, y, w_l)
            continue
        if wide:
            sampled = _bilinear_gather_wide(v_l, hl, wl, x, y)
        elif patch:
            sampled = _bilinear_gather_patch(
                v_l.reshape(b * nh, hl, wl, d),
                hl, wl,
                x.reshape(b * nh, lq * p), y.reshape(b * nh, lq * p),
            ).reshape(b, nh, lq, p, d)
        else:
            sampled = _bilinear_gather(v_l, hl, wl, x, y)  # (B, nh, Lq, P, d)
        out = out + (sampled * w_l[..., None]).sum(axis=3)

    return out.transpose(0, 2, 1, 3).reshape(b, lq, nh * d)
