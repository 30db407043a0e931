"""Fused cotangent-glue kernel for the flat deformable backward.

In _flat_level's backward (ops/msdeform.py), between the XLA re-gather and
the d_value scatter sit pure data-flow ops: tile the output cotangent over
taps/slots, form per-slot row dots (d_wa) and the scatter rows (contrib).
XLA materializes the tiled cotangent via broadcast+reshape (f32, ~700 MB
per level-image) and runs the slot dots in relayout-heavy shapes — ~340 ms
of the composed B=2 pixel-decoder backward (trace, ROADMAP r4).

This kernel streams row chunks once: reads the gathered tap rows
(Rc, 4d) and the per-query cotangent block (Qc, d), builds the tiled
cotangent in VMEM (never in HBM), and emits

  contrib (Rc, 4d)  = wa-expanded * tiled-cotangent   (scatter rows)
  dots    (Rc, 4)   = per-slot <tap row, cotangent>   (d_wa)

contrib is written in the VALUE dtype (bf16 in training — the f32->scatter
convert fuses into the scatter), halving the one remaining big write.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _glue_kernel(g4_ref, go_ref, wa_ref, contrib_ref, dots_ref, *, p: int,
                 d: int):
    f32 = jnp.float32
    go = go_ref[...]                         # (Qc, d) ct, f32
    # lane-tile to the 4 slots, then row-repeat to the P points
    gt_q = jnp.concatenate([go, go, go, go], axis=1)        # (Qc, 4d)
    qc = go.shape[0]
    gt_rows = jnp.broadcast_to(
        gt_q[:, None, :], (qc, p, 4 * d)
    ).reshape(qc * p, 4 * d)                                # (Rc, 4d)
    g4 = g4_ref[...]                                        # (Rc, 4d) ct
    wa = wa_ref[...]                                        # (Rc, 4) f32
    prod = g4.astype(f32) * gt_rows.astype(f32)
    for k in range(4):
        dots_ref[:, k] = jnp.sum(prod[:, k * d:(k + 1) * d], axis=1)
        contrib_ref[:, k * d:(k + 1) * d] = (
            wa[:, k:k + 1] * gt_rows[:, k * d:(k + 1) * d].astype(f32)
        ).astype(contrib_ref.dtype)


def _glue_kernel_q(g4_ref, go_ref, wa_ref, contrib_ref, dots_ref, *, p: int,
                   d: int):
    """Query-row layout variant: rows pre-reshaped to (q, p*4d) (a pure
    bitcast — row (q, p) of the (R, 4d) layout is lane-contiguous), so the
    cotangent tiling is a LANE concatenate instead of a sublane
    row-broadcast+reshape (the T(8,128) row expansion was the original
    kernel's hot spot)."""
    f32 = jnp.float32
    go = go_ref[...]                                  # (Qc, d) f32
    gt = jnp.concatenate([go] * (4 * p), axis=1)      # (Qc, p*4d)
    g4 = g4_ref[...]                                  # (Qc, p*4d)
    wa = wa_ref[...]                                  # (Qc, p*4) f32
    prod = g4.astype(f32) * gt
    for s in range(4 * p):
        dots_ref[:, s] = jnp.sum(prod[:, s * d:(s + 1) * d], axis=1)
        contrib_ref[:, s * d:(s + 1) * d] = (
            wa[:, s:s + 1] * gt[:, s * d:(s + 1) * d]
        ).astype(contrib_ref.dtype)


def deform_bwd_glue_q(g4: jax.Array, gout: jax.Array, wa: jax.Array,
                      p: int) -> tuple[jax.Array, jax.Array]:
    """Same contract as :func:`deform_bwd_glue`, query-row layout inside.
    g4 (R, 4d) value-dtype rows; gout (Q, d); wa (R, 4) f32; R == Q*p.
    Returns (contrib (R, 4d) in g4.dtype, dots (R, 4) f32)."""
    r, fourd = g4.shape
    d = fourd // 4
    q = gout.shape[0]
    assert q * p == r, (q, p, r)
    qc = 1024
    while qc > 8 and q % qc:
        qc //= 2
    if q % qc:
        raise ValueError(f"q={q} not divisible by a power-of-two chunk")
    g4q = g4.reshape(q, p * fourd)      # bitcast: (q, p) rows are contiguous
    waq = wa.reshape(q, p * 4)
    contrib, dots = pl.pallas_call(
        functools.partial(_glue_kernel_q, p=p, d=d),
        grid=(q // qc,),
        in_specs=[
            pl.BlockSpec((qc, p * fourd), lambda i: (i, 0)),
            pl.BlockSpec((qc, d), lambda i: (i, 0)),
            pl.BlockSpec((qc, p * 4), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((qc, p * fourd), lambda i: (i, 0)),
            pl.BlockSpec((qc, p * 4), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, p * fourd), g4.dtype),
            jax.ShapeDtypeStruct((q, p * 4), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(g4q, gout.astype(jnp.float32), waq)
    return contrib.reshape(r, fourd), dots.reshape(r, 4)


def deform_bwd_glue(g4: jax.Array, gout: jax.Array, wa: jax.Array,
                    p: int) -> tuple[jax.Array, jax.Array]:
    """g4 (R, 4d) tap rows (value dtype); gout (Q, d) output cotangent with
    R == Q*p; wa (R, 4) f32 folded slot weights. Returns
    (contrib (R, 4d) in g4.dtype, dots (R, 4) f32)."""
    r, fourd = g4.shape
    d = fourd // 4
    q = gout.shape[0]
    assert q * p == r, (q, p, r)
    qc = 2048
    while qc > 8 and q % qc:
        qc //= 2
    if q % qc:
        raise ValueError(f"q={q} not divisible by a power-of-two chunk")
    rc = qc * p
    contrib, dots = pl.pallas_call(
        functools.partial(_glue_kernel, p=p, d=d),
        grid=(q // qc,),
        in_specs=[
            pl.BlockSpec((rc, fourd), lambda i: (i, 0)),
            pl.BlockSpec((qc, d), lambda i: (i, 0)),
            pl.BlockSpec((rc, 4), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rc, fourd), lambda i: (i, 0)),
            pl.BlockSpec((rc, 4), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, fourd), g4.dtype),
            jax.ShapeDtypeStruct((r, 4), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(g4, gout.astype(jnp.float32), wa)
    return contrib, dots
