"""Block one-hot segmented scatter-add (round 5).

Replaces XLA's scatter-add for the deformable backward's d_value rows.
XLA's lowering is row-rate bound (~45-60M rows/s: sort + permute + a
sequential per-update apply — 138+85+85 ms of the B=2 1024^2 pixel-decoder
backward, scripts/trace_top_ops.py). This formulation turns the
accumulation into MXU matmuls:

  1. XLA side: argsort rows by destination; pack the sorted rows into
     CHUNK-row groups aligned so every chunk's destinations fall in ONE
     ``block``-row window of the output (per-destination-block padding to
     chunk multiples, >= 1 chunk per block so every output block is
     visited and zeroed). The pack is ONE composed row gather
     (contrib[order[src]]) plus integer index arithmetic — no scatter.
  2. Pallas kernel (serial grid over chunks, scalar-prefetched block ids):
     builds the (block, chunk) one-hot of local destinations with a VPU
     compare and accumulates ``one_hot @ rows`` into the VMEM-resident
     output block on the MXU (bf16 x bf16 -> f32 accumulate; one-hot 0/1
     and row values are exact in bf16, so the sum matches the f32 scatter
     up to addition order).

FLOPs: R_padded * block * width * 2 per scatter (~200 GFLOP bf16 at the
res3 shape = ~1 ms at the v5e MXU peak) vs the 11.5 ms XLA scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _seg_kernel(blk_ref, first_ref, local_ref, rows_ref, out_ref, *,
                block: int):
    c = pl.program_id(0)

    @pl.when(first_ref[c] == 1)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    local = local_ref[...]  # (chunk,) int32 local dest, -1 = padding
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (block, local.shape[0]), 0)
        == local[None, :]
    )
    out_ref[...] += jnp.dot(
        oh.astype(rows_ref.dtype), rows_ref[...],
        preferred_element_type=jnp.float32,
    )


def segmented_scatter_add(contrib: jax.Array, idx: jax.Array, n_out: int,
                          block: int = 512, chunk: int = 1024) -> jax.Array:
    # chunk=1024: XLA tiles 1-D s32 as T(1024), and Mosaic requires the
    # 1-D local-dest block to match that tiling.
    """sum rows of ``contrib`` (R, W) into row ``idx`` (R,) of a zeroed
    (n_out, W) float32 table. ``n_out`` must be a multiple of ``block``.
    Equivalent to ``jnp.zeros((n_out, W), f32).at[idx].add(contrib)`` up to
    float addition order."""
    r, wdt = contrib.shape
    assert n_out % block == 0, (n_out, block)
    nblk = n_out // block
    n_chunks = -(-r // chunk) + nblk  # static worst case: each block pads <1
    p_total = n_chunks * chunk

    order = jnp.argsort(idx)
    sidx = idx[order]  # (R,) sorted destinations
    # rows per destination block + >=1 chunk per block
    starts = jnp.searchsorted(
        sidx, jnp.arange(nblk + 1, dtype=idx.dtype) * block)
    cnt = (starts[1:] - starts[:-1]).astype(jnp.int32)
    cpb = jnp.maximum(-(-cnt // chunk), 1)  # chunks per block
    chunk_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(cpb, dtype=jnp.int32)])
    used = chunk_off[nblk]  # dynamic <= n_chunks

    # Per-CHUNK scalars first (n_chunks-sized tiny gathers), then broadcast
    # to slots — per-slot lookups into the tiny tables lowered as 7 ms
    # kCustom gathers (measured; the whole point of this layout is to keep
    # the big arrays on streaming paths).
    cid = jnp.arange(n_chunks, dtype=jnp.int32)
    blk_of_chunk = jnp.clip(
        jnp.searchsorted(chunk_off[1:], cid, side="right"), 0, nblk - 1
    ).astype(jnp.int32)
    is_first = ((cid == chunk_off[blk_of_chunk]) & (cid < used)).astype(
        jnp.int32)
    start_c = starts[blk_of_chunk].astype(jnp.int32)      # (n_chunks,)
    end_c = starts[blk_of_chunk + 1].astype(jnp.int32)
    base_c = cid * chunk - chunk_off[blk_of_chunk] * chunk

    j = jnp.arange(chunk, dtype=jnp.int32)
    src = (start_c + base_c)[:, None] + j[None, :]        # (n_chunks, chunk)
    valid = (src < end_c[:, None]) & (cid[:, None] < used)
    src = jnp.clip(src, 0, r - 1).reshape(-1)
    valid = valid.reshape(-1)
    # Two-stage row fetch: the plain permutation gather is fast (~1 ms for
    # 688k rows — measured in s_sort_full), and the padded re-read's
    # indices are near-sequential, so both stay off the random-gather
    # slow path (the one-shot contrib[order[src]] composition measured
    # 9.25 ms — genuinely random addresses).
    sorted_rows = jnp.take(contrib, order, axis=0)
    rows = jnp.take(sorted_rows, src, axis=0)
    rows = jnp.where(valid[:, None], rows, jnp.zeros_like(rows))
    local = jnp.where(
        valid,
        jnp.take(sidx, src).astype(jnp.int32)
        - jnp.broadcast_to(
            blk_of_chunk[:, None] * block, (n_chunks, chunk)).reshape(-1),
        -1,
    )  # (p_total,) 1-D: a (1, chunk) 2-D block would violate the TPU
    # 8-sublane block rule

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda c, blk, first: (c,)),
            pl.BlockSpec((chunk, wdt), lambda c, blk, first: (c, 0)),
        ],
        out_specs=pl.BlockSpec(
            (block, wdt), lambda c, blk, first: (blk[c], 0)),
    )
    out = pl.pallas_call(
        functools.partial(_seg_kernel, block=block),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, wdt), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(blk_of_chunk, is_first, local, rows)
    return out
