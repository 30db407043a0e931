"""One-hot-matmul deformable sampling for SMALL pyramid levels (Pallas).

The multi-scale deformable attention gather is issue-rate bound on TPU
(~100M gather rows/s regardless of row width — see ops/msdeform.py). For a
level whose value table fits VMEM (res5: 32x32 cells x 8 heads x 256-wide
rows = 0.5 MB/head), sampling can instead be expressed per query block as

    Ws[i, j] = sum_p wslot[i, p, s] * (j == idx[i, p])      (VPU compares)
    out[i]   = sum_s  Ws @ v4[:, s*d:(s+1)*d]               (MXU matmuls)

— no HBM gather at all: the dense one-hot weight matrix lives only in VMEM
scratch. Measured per deformable layer on v5e this replaces a 6.8 ms gather
with ~1-2 ms of compares + matmuls. Larger levels stay on the XLA wide
gather (the compare cost grows linearly with the cell count; res4 breaks
even, res3 loses).

The slot weights fold the bilinear tap weights, the zero-padding validity,
AND the per-point attention weight, so the kernel's output is the full
per-level contribution sum_p aw_p * bilinear(v, loc_p).

Backward: custom VJP recomputing through the XLA wide-gather formulation
(ops/msdeform.py), which is the correctness oracle for this kernel too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehot_kernel(idx_ref, ws_ref, v4_ref, o_ref, *, d: int, n_points: int):
    """Blocks: idx (1, bq, P) int32; ws (1, bq, 4*P) f32 (slot-major:
    ws[:, s*P + p]); v4 (1, cells, 4*d); out (1, bq, d)."""
    idx = idx_ref[0]
    ws = ws_ref[0]
    v4 = v4_ref[0]
    bq = idx.shape[0]
    cells = v4.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (bq, cells), 1)
    acc = jnp.zeros((bq, d), jnp.float32)
    for s in range(4):
        w_s = jnp.zeros((bq, cells), jnp.float32)
        for p in range(n_points):
            hit = (iota == idx[:, p][:, None]).astype(jnp.float32)
            w_s = w_s + hit * ws[:, s * n_points + p][:, None]
        acc = acc + jnp.dot(
            w_s.astype(v4.dtype), v4[:, s * d:(s + 1) * d],
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = acc.astype(o_ref.dtype)


def onehot_deform_level_forward(v4, idx, wslot, n_points: int):
    """v4 (BH, cells, 4d); idx (BH, Lq, P) int32; wslot (BH, Lq, 4, P) f32
    (slot, point). Returns (BH, Lq, d)."""
    bh, cells, d4 = v4.shape
    d = d4 // 4
    lq = idx.shape[1]
    ws = wslot.reshape(bh, lq, 4 * n_points)
    block = 512
    pad = (-lq) % block
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
        ws = jnp.pad(ws, ((0, 0), (0, pad), (0, 0)))
    lqp = lq + pad
    out = pl.pallas_call(
        functools.partial(_onehot_kernel, d=d, n_points=n_points),
        grid=(bh, lqp // block),
        in_specs=[
            pl.BlockSpec((1, block, n_points), lambda b, q: (b, q, 0)),
            pl.BlockSpec((1, block, 4 * n_points), lambda b, q: (b, q, 0)),
            pl.BlockSpec((1, cells, d4), lambda b, q: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, d), lambda b, q: (b, q, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lqp, d), v4.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(idx, ws, v4)
    return out[:, :lq]
