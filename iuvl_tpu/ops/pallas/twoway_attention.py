"""Fused Pallas kernels for the SAM two-way-transformer cross attentions.

The one-encode/many-decode bench is HBM-bound on the per-prompt image keys
tensor (B=256 prompts x 4096 tokens x 256 ch). The XLA formulation (even
with block-diagonal head packing, see models/sam/mask_decoder.py) pays a
full HBM round trip per op: k/v projections, scores, softmax, probs, attn
output, out-projection, residual, LayerNorm. These kernels collapse each
cross-attention site into ONE pass over the keys tensor:

- ``i2t_block_step`` (image -> token, ends every TwoWayAttentionBlock):
  per keys block, in VMEM: q-projection (+folded PE), scores against the
  block-diagonal packed token K/V, grouped softmax (exact — the row max is
  constant across head groups), attention, out-projection, residual add,
  and the block's LayerNorm. Reads keys once, writes updated keys once.

- ``t2i_stream`` (token -> image): streams keys blocks, projecting k/v
  in VMEM and accumulating an online softmax over the image axis into the
  packed (head, token)-row query state. Reads keys once, writes the tiny
  (B, R, I) output.

Both carry a custom VJP whose backward recomputes via the XLA-equivalent
functions (``*_xla`` below) — also the CPU/interpret-mode oracles in tests.
Reference semantics: sam/modeling/transformer.py:109-240 (linear
reassociation only; see the packing notes in models/sam/mask_decoder.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(y: jax.Array, w: jax.Array, b: jax.Array, eps: float = 1e-5):
    yf = y.astype(jnp.float32)
    mu = yf.mean(axis=-1, keepdims=True)
    var = ((yf - mu) ** 2).mean(axis=-1, keepdims=True)
    out = (yf - mu) * jax.lax.rsqrt(var + eps)
    return out * w.astype(jnp.float32) + b.astype(jnp.float32)


# --------------------------------------------------------------------- #
# image -> token (fused block step)
# --------------------------------------------------------------------- #

def i2t_block_step_xla(keys, pe_wq, kbd, vbd, wq, bq, wo, bo, ln_w, ln_b,
                       G, smask, scale):
    """XLA oracle / backward for the fused i2t block step.

    keys (Bk, N, C) with Bk in {1, B}; pe_wq (1, N, I) = key_pe @ wq
    (precomputed once, batch-1); kbd/vbd (B, R, I) block-diagonal packed
    tokens; G (R, R) same-head indicator; smask (R,) 0/-inf slot mask.
    Returns LN(keys + out_proj(grouped_attn(keys @ wq + pe_wq + bq)))
    with batch B, in keys.dtype.
    """
    dt = keys.dtype
    qp = keys @ wq.astype(dt) + pe_wq.astype(dt) + bq.astype(dt)
    spec = "qc,bkc->bqk" if keys.shape[0] == 1 else "bqc,bkc->bqk"
    qp_in = qp[0] if keys.shape[0] == 1 else qp
    s = jnp.einsum(spec, qp_in, kbd, preferred_element_type=jnp.float32)
    s = s * scale + smask
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.einsum("bqk,kj->bqj", e, G)
    p = (e / denom).astype(dt)
    att = jnp.einsum("bqk,bkc->bqc", p, vbd)
    out = att @ wo.astype(dt) + bo.astype(dt)
    y = keys + out  # (B, N, C); broadcasts if Bk == 1
    return _ln(y, ln_w, ln_b).astype(dt)


def _i2t_kernel(x_ref, pe_ref, kbd_ref, vbd_ref, wq_ref, bq_ref, wo_ref,
                bo_ref, lnw_ref, lnb_ref, g_ref, smask_ref, o_ref, *,
                scale: float, bp: int, shared_keys: bool):
    f32 = jnp.float32
    g = g_ref[...]
    smask = smask_ref[...]
    if shared_keys:
        # Batch-1 keys (one-encode/many-decode): the q-projection is
        # prompt-independent — compute it once per keys block, not per prompt.
        x_sh = x_ref[0]
        qp_sh = (jnp.dot(x_sh, wq_ref[...], preferred_element_type=f32)
                 .astype(x_sh.dtype) + pe_ref[0] + bq_ref[...])
    for j in range(bp):
        if shared_keys:
            x, qp = x_sh, qp_sh
        else:
            x = x_ref[j]  # (bq, C)
            qp = (jnp.dot(x, wq_ref[...], preferred_element_type=f32)
                  .astype(x.dtype) + pe_ref[0] + bq_ref[...])
        s = jnp.dot(qp, kbd_ref[j].T, preferred_element_type=f32)
        s = s * scale + smask
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.dot(e, g, preferred_element_type=f32)
        p = (e / denom).astype(x.dtype)
        att = jnp.dot(p, vbd_ref[j], preferred_element_type=f32).astype(x.dtype)
        out = jnp.dot(att, wo_ref[...], preferred_element_type=f32).astype(x.dtype)
        out = out + bo_ref[...]
        y = x + out
        o_ref[j] = _ln(y, lnw_ref[...], lnb_ref[...]).astype(o_ref.dtype)


def _prompt_block(b: int, budget: int) -> int:
    """Largest divisor of b within the VMEM budget — prompts per grid step.
    One prompt per step pays the ~3-5 us Pallas grid-step cost 256x per
    kernel call at the serving chunk size; blocking amortizes it."""
    for cand in range(budget, 1, -1):
        if b % cand == 0:
            return cand
    return 1


def _i2t_forward(keys, pe_wq, kbd, vbd, wq, bq, wo, bo, ln_w, ln_b,
                 G, smask, scale):
    bk_keys, n, c = keys.shape
    b, r, i = kbd.shape
    block_q = min(4096, n)
    assert n % block_q == 0, (n, block_q)
    shared = bk_keys == 1
    # VMEM per step ~= (bp_in + bp_out) * block_q * c * 2B, double-buffered.
    # Measured (v5e, 256-prompt chunk): bp=8 (either case) regresses —
    # 64 MB of live blocks starves prefetch overlap (keys-side 6.64 ->
    # 7.06 ms); bp=16 shared OOMs the 80 MB scoped limit. 8/4 is the knee.
    bp = _prompt_block(b, 8 if shared else 4)
    kspec = (pl.BlockSpec((1, block_q, c), lambda bb, qb: (0, qb, 0))
             if shared else
             pl.BlockSpec((bp, block_q, c), lambda bb, qb: (bb, qb, 0)))
    grid = (b // bp, n // block_q)
    out = pl.pallas_call(
        functools.partial(_i2t_kernel, scale=scale, bp=bp, shared_keys=shared),
        grid=grid,
        in_specs=[
            kspec,
            pl.BlockSpec((1, block_q, i), lambda bb, qb: (0, qb, 0)),
            pl.BlockSpec((bp, r, i), lambda bb, qb: (bb, 0, 0)),
            pl.BlockSpec((bp, r, i), lambda bb, qb: (bb, 0, 0)),
            pl.BlockSpec((c, i), lambda bb, qb: (0, 0)),
            pl.BlockSpec((1, i), lambda bb, qb: (0, 0)),
            pl.BlockSpec((i, c), lambda bb, qb: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, qb: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, qb: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, qb: (0, 0)),
            pl.BlockSpec((r, r), lambda bb, qb: (0, 0)),
            pl.BlockSpec((1, r), lambda bb, qb: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bp, block_q, c), lambda bb, qb: (bb, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), keys.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=80 * 1024 * 1024,
        ),
    )(keys, pe_wq, kbd, vbd, wq, bq.reshape(1, -1), wo, bo.reshape(1, -1),
      ln_w.reshape(1, -1), ln_b.reshape(1, -1),
      G.astype(jnp.float32), smask.reshape(1, -1).astype(jnp.float32))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(12,))
def i2t_block_step(keys, pe_wq, kbd, vbd, wq, bq, wo, bo, ln_w, ln_b,
                   G, smask, scale):
    """Fused image->token block step (see module docstring)."""
    return _i2t_forward(keys, pe_wq, kbd, vbd, wq, bq, wo, bo, ln_w, ln_b,
                        G, smask, scale)


def _i2t_fwd_rule(keys, pe_wq, kbd, vbd, wq, bq, wo, bo, ln_w, ln_b,
                  G, smask, scale):
    out = _i2t_forward(keys, pe_wq, kbd, vbd, wq, bq, wo, bo, ln_w, ln_b,
                       G, smask, scale)
    return out, (keys, pe_wq, kbd, vbd, wq, bq, wo, bo, ln_w, ln_b, G, smask)


def _i2t_bwd_rule(scale, res, g):
    args = res
    _, vjp = jax.vjp(
        lambda *a: i2t_block_step_xla(*a, scale), *args
    )
    return vjp(g)


i2t_block_step.defvjp(_i2t_fwd_rule, _i2t_bwd_rule)


# --------------------------------------------------------------------- #
# token -> image (streamed online softmax)
# --------------------------------------------------------------------- #

def t2i_stream_xla(qbd, keys, pe_wk, wk, bk_, wv, bv):
    """XLA oracle / backward for the streamed t2i attention.

    qbd (B, R, I) block-diagonal packed queries, PRE-scaled by 1/sqrt(d);
    keys (Bk, N, C), Bk in {1, B}; pe_wk (1, N, I) = key_pe @ wk.
    Returns obd (B, R, I): per-(head, token) rows attended over the image
    axis (off-head output columns are garbage; the caller's static
    head-merge mask discards them).
    """
    dt = keys.dtype
    kp = keys @ wk.astype(dt) + pe_wk.astype(dt) + bk_.astype(dt)
    vp = keys @ wv.astype(dt) + bv.astype(dt)
    spec_s = "bqc,kc->bqk" if keys.shape[0] == 1 else "bqc,bkc->bqk"
    s = jnp.einsum(spec_s, qbd,
                   kp[0] if keys.shape[0] == 1 else kp,
                   preferred_element_type=jnp.float32)
    m = jax.lax.optimization_barrier(jnp.max(s, axis=-1, keepdims=True))
    e = jnp.exp(s - m)
    p = (e / e.sum(axis=-1, keepdims=True)).astype(dt)
    spec_o = "bqk,kc->bqc" if keys.shape[0] == 1 else "bqk,bkc->bqc"
    return jnp.einsum(spec_o, p, vp[0] if keys.shape[0] == 1 else vp)


def _t2i_kernel(qbd_ref, x_ref, pe_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                o_ref, acc_ref, m_ref, l_ref, *, bp: int, r: int,
                shared_keys: bool):
    kb = pl.program_id(1)
    n_kblocks = pl.num_programs(1)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f32 = jnp.float32
    if shared_keys:
        # Batch-1 keys: k/v projections are prompt-independent — once per
        # keys block, shared by every prompt in this step.
        x = x_ref[0]  # (bk, C)
        kp = (jnp.dot(x, wk_ref[...], preferred_element_type=f32)
              .astype(x.dtype) + pe_ref[0] + bk_ref[...])
        vp = jnp.dot(x, wv_ref[...], preferred_element_type=f32).astype(x.dtype)
        vp = vp + bv_ref[...]
    for j in range(bp):
        if not shared_keys:
            x = x_ref[j]
            kp = (jnp.dot(x, wk_ref[...], preferred_element_type=f32)
                  .astype(x.dtype) + pe_ref[0] + bk_ref[...])
            vp = jnp.dot(x, wv_ref[...], preferred_element_type=f32
                         ).astype(x.dtype)
            vp = vp + bv_ref[...]
        s = jnp.dot(qbd_ref[j], kp.T, preferred_element_type=f32)

        sl = slice(j * r, (j + 1) * r)
        m_prev = m_ref[sl]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[sl] = alpha * l_ref[sl] + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[sl] = acc_ref[sl] * alpha + jnp.dot(
            p.astype(vp.dtype), vp, preferred_element_type=jnp.float32
        )
        m_ref[sl] = m_new

    @pl.when(kb == n_kblocks - 1)
    def _finalize():
        for j in range(bp):
            o_ref[j] = (acc_ref[j * r:(j + 1) * r]
                        / jnp.maximum(l_ref[j * r:(j + 1) * r], 1e-30)
                        ).astype(o_ref.dtype)


def _t2i_forward(qbd, keys, pe_wk, wk, bk_, wv, bv):
    b, r, i = qbd.shape
    bk_keys, n, c = keys.shape
    block_k = min(4096, n)
    assert n % block_k == 0, (n, block_k)
    shared = bk_keys == 1
    bp = _prompt_block(b, 16 if shared else 4)
    kspec = (pl.BlockSpec((1, block_k, c), lambda bb, kb: (0, kb, 0))
             if shared else
             pl.BlockSpec((bp, block_k, c), lambda bb, kb: (bb, kb, 0)))
    grid = (b // bp, n // block_k)
    out = pl.pallas_call(
        functools.partial(_t2i_kernel, bp=bp, r=r, shared_keys=shared),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bp, r, i), lambda bb, kb: (bb, 0, 0)),
            kspec,
            pl.BlockSpec((1, block_k, i), lambda bb, kb: (0, kb, 0)),
            pl.BlockSpec((c, i), lambda bb, kb: (0, 0)),
            pl.BlockSpec((1, i), lambda bb, kb: (0, 0)),
            pl.BlockSpec((c, i), lambda bb, kb: (0, 0)),
            pl.BlockSpec((1, i), lambda bb, kb: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bp, r, i), lambda bb, kb: (bb, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, r, i), keys.dtype),
        scratch_shapes=[
            pltpu.VMEM((bp * r, i), jnp.float32),
            pltpu.VMEM((bp * r, 1), jnp.float32),
            pltpu.VMEM((bp * r, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=80 * 1024 * 1024,
        ),
    )(qbd, keys, pe_wk, wk, bk_.reshape(1, -1), wv, bv.reshape(1, -1))
    return out


@jax.custom_vjp
def t2i_stream(qbd, keys, pe_wk, wk, bk_, wv, bv):
    """Streamed token->image attention (see module docstring)."""
    return _t2i_forward(qbd, keys, pe_wk, wk, bk_, wv, bv)


def _t2i_fwd_rule(qbd, keys, pe_wk, wk, bk_, wv, bv):
    return _t2i_forward(qbd, keys, pe_wk, wk, bk_, wv, bv), (
        qbd, keys, pe_wk, wk, bk_, wv, bv)


def _t2i_bwd_rule(res, g):
    _, vjp = jax.vjp(t2i_stream_xla, *res)
    return vjp(g)


t2i_stream.defvjp(_t2i_fwd_rule, _t2i_bwd_rule)
