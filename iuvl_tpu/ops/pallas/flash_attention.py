"""Fused flash attention (Pallas TPU).

The hot kernel behind the SAM ViT backbone (SURVEY.md §2.8 north-star): via
``augment_qk_rel_pos`` the decomposed rel-pos bias becomes part of the QK
contraction, so a *vanilla* softmax(QK^T)V kernel covers both windowed
(N=196) and global (N=4096) blocks without materializing the (N, N) score
matrix in HBM.

Design: grid over (batch*heads, q blocks); the kernel streams K/V blocks
through VMEM with an online-softmax running (max, sum, acc) state in fp32
scratch. Block sizes are multiples of the MXU tile (128); ragged N is
padded by the caller wrapper and masked via -inf on padded keys.

Measured on v5e (global SAM block, 12 heads x 4096 x 192-aug): 1.04 ms at
block (2048, 1024) vs 1.64 ms for the XLA path. Blocks of 2048x2048+ OOM
the 16 MB VMEM scope. Inference path only for now — no custom VJP yet, so
training uses the XLA augmented-matmul path (rel_pos_attention impl='xla').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(n_valid_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref):
    """One (q block, k block) grid step. Block shapes:
    q_ref (1, bq, d_aug), k_ref (1, bk, d_aug), v_ref (1, bk, dv)."""
    kb = pl.program_id(2)
    n_kblocks = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)

    # Mask padded keys (beyond the true sequence length).
    n_valid = n_valid_ref[0]
    bk = k.shape[0]
    key_idx = kb * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_idx < n_valid, s, NEG_INF)

    m_prev = m_ref[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_ref[:] + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(kb == n_kblocks - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jax.Array,  # (B, H, N, d_qk)
    k: jax.Array,  # (B, H, N, d_qk)
    v: jax.Array,  # (B, H, N, d_v)
    softmax_scale: float = 1.0,
    block_q: int = 256,
    block_k: int = 256,
) -> jax.Array:
    """Differentiable: forward = fused Pallas kernel; backward = XLA
    recompute of softmax(QK^T) with the standard flash gradient formulas
    (the usual fwd-fused / bwd-recompute trade)."""
    return _flash_forward(q, k, v, softmax_scale, block_q, block_k)


def _flash_fwd_rule(q, k, v, softmax_scale, block_q, block_k):
    return _flash_forward(q, k, v, softmax_scale, block_q, block_k), (q, k, v)


def _flash_bwd_rule(softmax_scale, block_q, block_k, res, g):
    q, k, v = res
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q * softmax_scale, k,
        preferred_element_type=jnp.float32,
    )
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p.astype(g.dtype), g)
    dp = jnp.einsum(
        "bhqd,bhkd->bhqk", g, v, preferred_element_type=jnp.float32
    )
    ds = p * (dp - (dp * p).sum(-1, keepdims=True))
    ds = ds.astype(q.dtype)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k) * softmax_scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q * softmax_scale)
    return dq, dk, dv


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


@functools.partial(
    jax.jit, static_argnames=("softmax_scale", "block_q", "block_k")
)
def _flash_forward(
    q: jax.Array,  # (B, H, N, d_qk)
    k: jax.Array,  # (B, H, N, d_qk)
    v: jax.Array,  # (B, H, N, d_v)
    softmax_scale: float = 1.0,
    block_q: int = 256,
    block_k: int = 256,
) -> jax.Array:
    b, h, n, d_qk = q.shape
    d_v = v.shape[-1]
    if softmax_scale != 1.0:
        q = q * softmax_scale

    # Pad N to block multiples and feature dims to lane width.
    def pad_to(x, mult, axis):
        pad = (-x.shape[axis]) % mult
        if pad == 0:
            return x
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, pad)
        return jnp.pad(x, cfg)

    npow = max(128, 1 << (n - 1).bit_length())
    block_q = min(block_q, npow)
    block_k = min(block_k, npow)
    qp = pad_to(pad_to(q, block_q, 2), 128, 3)
    kp = pad_to(pad_to(k, block_k, 2), 128, 3)
    vp = pad_to(pad_to(v, block_k, 2), 128, 3)
    np_, dqk_p = qp.shape[2], qp.shape[3]
    nk_p, dv_p = vp.shape[2], vp.shape[3]

    qf = qp.reshape(b * h, np_, dqk_p)
    kf = kp.reshape(b * h, nk_p, dqk_p)
    vf = vp.reshape(b * h, nk_p, dv_p)
    n_valid = jnp.asarray([n], jnp.int32)

    grid = (b * h, np_ // block_q, nk_p // block_k)
    out = pl.pallas_call(
        _flash_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, block_q, dqk_p), lambda bh, qb, kb, *_: (bh, qb, 0)
                ),
                pl.BlockSpec(
                    (1, block_k, dqk_p), lambda bh, qb, kb, *_: (bh, kb, 0)
                ),
                pl.BlockSpec(
                    (1, block_k, dv_p), lambda bh, qb, kb, *_: (bh, kb, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, dv_p), lambda bh, qb, kb, *_: (bh, qb, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, dv_p), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, np_, dv_p), v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(n_valid, qf, kf, vf)

    return out.reshape(b, h, np_, dv_p)[:, :, :n, :d_v]
