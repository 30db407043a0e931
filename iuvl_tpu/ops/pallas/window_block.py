"""Whole-attention fused kernel for SAM's windowed ViT blocks.

The per-window attention kernel (ops/pallas/window_attention.py) left the
QKV and output projections outside as separate XLA matmuls; in-model the
windowed blocks then run ~2x their isolated cost — the block is dispatch/
latency bound, not FLOP bound (ROADMAP round-2 measurement). This kernel
folds the whole Attention module body for one window into a single Pallas
call:

    qkv  = x @ Wqkv + bqkv                      (N, 3C) one MXU matmul
    per head h:  s = (q_h @ k_h^T) * scale + decomposed rel-pos bias
                 o_h = softmax(s) @ v_h          (exact fp32 row softmax)
    out  = concat_h(o_h) @ Wo + bo               (N, C)

so the (nW, N, 3C) qkv tensor and the pre-projection attention output never
round-trip through HBM, and the per-block kernel count drops from 3 (qkv
matmul, attention, proj matmul) to 1. The rel-pos bias uses the same
static selector matmuls as window_attention.py (semantics match the
reference decomposed bias, /root/reference/sam/modeling/image_encoder.py:
340-376). K is never materialized transposed: s is a dot_general
contracting the head dim of q and k directly ("nt" matmul, native on the
MXU).

Backward: custom VJP recomputing through the augmented-matmul XLA path
(same pattern as window_attention.py) — grads flow to x and all four
projection tensors plus the rel-pos tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_attention import _bias_consts


def _block_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                  rht_ref, rwt_ref, mh_ref, mw_ref, ch_ref, eh_ref, ew_ref,
                  o_ref, acc_ref, *, wps: int, heads: int, scale: float):
    f32 = jnp.float32
    n = x_ref.shape[1]
    c = x_ref.shape[2]
    hd = c // heads
    mh = mh_ref[...]
    mw = mw_ref[...]
    ch = ch_ref[...]
    eh = eh_ref[...]
    ew = ew_ref[...]
    rht = rht_ref[...]
    rwt = rwt_ref[...]
    wqkv = wqkv_ref[...]
    bqkv = bqkv_ref[...]
    for wi in range(wps):
        xq = x_ref[wi]  # (N, C)
        qkv = (
            jnp.dot(xq, wqkv, preferred_element_type=f32) + bqkv
        ).astype(xq.dtype)  # (N, 3C)
        for h in range(heads):
            qh = qkv[:, h * hd:(h + 1) * hd]
            kh = qkv[:, c + h * hd:c + (h + 1) * hd]
            vh = qkv[:, 2 * c + h * hd:2 * c + (h + 1) * hd]
            m1h = jnp.dot(qh, rht, preferred_element_type=f32) * mh
            relh = jnp.dot(m1h, ch, preferred_element_type=f32)  # (N, win)
            m1w = jnp.dot(qh, rwt, preferred_element_type=f32) * mw
            relw = jnp.dot(m1w, ch, preferred_element_type=f32)
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            ) * scale
            s = s + jnp.dot(relh, eh, preferred_element_type=f32)
            s = s + jnp.dot(relw, ew, preferred_element_type=f32)
            mx = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - mx)
            p = (e / e.sum(axis=-1, keepdims=True)).astype(vh.dtype)
            acc_ref[:, h * hd:(h + 1) * hd] = jnp.dot(
                p, vh, preferred_element_type=f32
            ).astype(acc_ref.dtype)
        o_ref[wi] = (
            jnp.dot(acc_ref[...], wo_ref[...], preferred_element_type=f32)
            + bo_ref[...]
        ).astype(o_ref.dtype)


def _block_forward(xw, wqkv, bqkv, wo, bo, Rh, Rw, win: int, heads: int):
    nw, n, c = xw.shape
    assert n == win * win, (n, win)
    hd = c // heads
    scale = hd ** -0.5
    wps = 1
    for cand in (5, 4, 3, 2):
        if nw % cand == 0:
            wps = cand
            break
    maskH, maskW, CH, _, EH, EW = _bias_consts(win)
    dt = xw.dtype
    rht = Rh.transpose(2, 0, 1).reshape(hd, n).astype(dt)
    rwt = Rw.transpose(2, 0, 1).reshape(hd, n).astype(dt)
    consts = [rht, rwt,
              jnp.asarray(maskH), jnp.asarray(maskW),
              jnp.asarray(CH), jnp.asarray(EH), jnp.asarray(EW)]
    wq = wqkv.astype(dt)
    bq = bqkv.astype(jnp.float32)
    wo_ = wo.astype(dt)
    bo_ = bo.astype(jnp.float32)
    xspec = pl.BlockSpec((wps, n, c), lambda i: (i, 0, 0))
    cspec = lambda x: pl.BlockSpec(x.shape, lambda i: (0,) * x.ndim)
    return pl.pallas_call(
        functools.partial(_block_kernel, wps=wps, heads=heads, scale=scale),
        grid=(nw // wps,),
        in_specs=[xspec] + [cspec(t) for t in (wq, bq, wo_, bo_)]
        + [cspec(t) for t in consts],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((nw, n, c), dt),
        scratch_shapes=[pltpu.VMEM((n, c), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(xw, wq, bq, wo_, bo_, *consts)


def _block_xla(xw, wqkv, bqkv, wo, bo, rel_pos_h, rel_pos_w, win, heads):
    """XLA oracle with the module's exact math (Dense casts params to the
    working dtype; fp32 softmax inside rel_pos_attention impl='xla')."""
    from ..rel_pos_attention import rel_pos_attention

    nw, n, c = xw.shape
    hd = c // heads
    qkv = xw @ wqkv.astype(xw.dtype) + bqkv.astype(xw.dtype)
    qkv = qkv.reshape(nw, n, 3, heads, hd)
    q, k, v = jnp.moveaxis(qkv, 2, 0)
    q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    out = rel_pos_attention(q, k, v, rel_pos_h, rel_pos_w, (win, win),
                            impl="xla")
    out = out.transpose(0, 2, 1, 3).reshape(nw, n, c)
    return out @ wo.astype(xw.dtype) + bo.astype(xw.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def window_attention_block(xw, wqkv, bqkv, wo, bo, rel_pos_h, rel_pos_w,
                           win, heads):
    """Fused windowed Attention module body (qkv proj + decomposed rel-pos
    attention + out proj) for pre-normalized, window-partitioned tokens.

    xw: (nW, N, C) with N == win*win; wqkv (C, 3C); wo (C, C);
    rel_pos_h/rel_pos_w: stored (2*win-1, head_dim) tables.
    Returns (nW, N, C) — the Attention output before the residual add.
    """
    from ..rel_pos_attention import rel_pos_table

    hd = xw.shape[-1] // heads
    Rh = rel_pos_table(win, win, rel_pos_h.astype(jnp.float32))
    Rw = rel_pos_table(win, win, rel_pos_w.astype(jnp.float32))
    return _block_forward(xw, wqkv, bqkv, wo, bo, Rh, Rw, win, heads)


def _wab_fwd(xw, wqkv, bqkv, wo, bo, rel_pos_h, rel_pos_w, win, heads):
    out = window_attention_block(xw, wqkv, bqkv, wo, bo, rel_pos_h,
                                 rel_pos_w, win, heads)
    return out, (xw, wqkv, bqkv, wo, bo, rel_pos_h, rel_pos_w)


def _wab_bwd(win, heads, res, g):
    xw, wqkv, bqkv, wo, bo, rel_pos_h, rel_pos_w = res
    out, vjp = jax.vjp(
        lambda *a: _block_xla(*a, win, heads),
        xw, wqkv, bqkv, wo, bo, rel_pos_h, rel_pos_w,
    )
    return vjp(g.astype(out.dtype))


window_attention_block.defvjp(_wab_fwd, _wab_bwd)
