"""Fused transformer-block tail kernel: residual + LN + MLP + residual.

After the whole-attention window kernel (ops/pallas/window_block.py) the
remaining per-block XLA ops in the SAM ViT are the post-attention tail

    x1  = shortcut + attn_out
    out = x1 + mlp_lin2(gelu(mlp_lin1(LayerNorm(x1))))

which XLA runs as ~5 dispatches with three full (B, HW, C) round trips
through HBM (the residual sum, the LN output, the (B, HW, 4C) hidden) —
the encoder is kernel-count/latency bound in-model, not FLOP bound
(ROADMAP round-2 measurement). This kernel folds the whole tail into one
Pallas call over token rows: the grid walks (T // rows) row chunks, both
MLP weight matrices stay resident in VMEM across steps (~9.4 MB for
ViT-B bf16), and the 4C hidden activation never leaves VMEM.

The tail is token-wise, so it applies identically to windowed and global
blocks (reference semantics: /root/reference/sam/modeling/image_encoder.py
:134-197, norm2 + MLPBlock + residual adds).

Numerics match the flax module path exactly: residual adds in the storage
dtype, LayerNorm in fp32 with flax's fast-variance formula (dtype=fp32
module => scale/bias applied in fp32), matmuls in the storage dtype with
fp32 accumulation, gelu matched to storage precision (tanh approximation
in bf16 — see models/sam/image_encoder.gelu).

Backward: custom VJP recomputing through the XLA tail (same pattern as
window_block.py) — grads flow to x, attn_out and all six tail params.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu(x):
    # Matches models/sam/image_encoder.gelu: tanh approximation in bf16,
    # exact erf otherwise.
    return jax.nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


def _ln_f32(xf, scale, bias, eps):
    """flax LayerNorm(dtype=fp32) math, same op order: fast variance
    (var = E[x^2] - E[x]^2 clamped at 0), mul = rsqrt(var+eps) * scale,
    y = (x - mean) * mul + bias."""
    mu = xf.mean(axis=-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(axis=-1, keepdims=True) - mu * mu, 0.0)
    mul = jax.lax.rsqrt(var + eps) * scale
    return (xf - mu) * mul + bias


def _tail_kernel(x_ref, a_ref, sc_ref, bi_ref, w1_ref, b1_ref, w2_ref,
                 b2_ref, o_ref, *, eps: float):
    x1 = x_ref[...] + a_ref[...]  # (R, C) storage dtype
    y = _ln_f32(x1.astype(jnp.float32), sc_ref[...], bi_ref[...], eps)
    y = y.astype(x1.dtype)
    h = jnp.dot(y, w1_ref[...], preferred_element_type=jnp.float32)
    h = h.astype(x1.dtype) + b1_ref[...].astype(x1.dtype)
    h = _gelu(h)
    m = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    m = m.astype(x1.dtype) + b2_ref[...].astype(x1.dtype)
    o_ref[...] = x1 + m


def _tail_xla(x, a, scale, bias, w1, b1, w2, b2, eps=1e-6):
    """XLA oracle with the flax module path's exact math (LayerNorm dtype
    fp32, Dense casts params to the working dtype)."""
    x1 = x + a
    y = _ln_f32(x1.astype(jnp.float32),
                scale.astype(jnp.float32), bias.astype(jnp.float32), eps)
    y = y.astype(x1.dtype)
    h = (y @ w1.astype(x1.dtype)) + b1.astype(x1.dtype)
    h = _gelu(h)
    m = (h @ w2.astype(x1.dtype)) + b2.astype(x1.dtype)
    return x1 + m


def _tail_forward(x, a, scale, bias, w1, b1, w2, b2, eps):
    t, c = x.shape
    rows = 256
    while rows > 8 and t % rows:
        rows //= 2
    if t % rows:
        return _tail_xla(x, a, scale, bias, w1, b1, w2, b2, eps)
    dt = x.dtype
    sc = scale.astype(jnp.float32)
    bi = bias.astype(jnp.float32)
    w1c, b1c = w1.astype(dt), b1.astype(jnp.float32)
    w2c, b2c = w2.astype(dt), b2.astype(jnp.float32)
    xspec = pl.BlockSpec((rows, c), lambda i: (i, 0))
    cspec = lambda p: pl.BlockSpec(p.shape, lambda i: (0,) * p.ndim)
    return pl.pallas_call(
        functools.partial(_tail_kernel, eps=eps),
        grid=(t // rows,),
        in_specs=[xspec, xspec] + [cspec(p) for p in
                                   (sc, bi, w1c, b1c, w2c, b2c)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((t, c), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(x, a, sc, bi, w1c, b1c, w2c, b2c)


@jax.custom_vjp
def block_tail(x, a, scale, bias, w1, b1, w2, b2):
    """Fused ViT block tail for flattened token rows.

    x: (T, C) residual stream (pre-attention shortcut); a: (T, C) attention
    output; scale/bias: LayerNorm params (C,); w1 (C, H), b1 (H,), w2 (H, C),
    b2 (C,) MLP params. Returns (T, C) — the block output.
    """
    return _tail_forward(x, a, scale, bias, w1, b1, w2, b2, 1e-6)


def _bt_fwd(x, a, scale, bias, w1, b1, w2, b2):
    out = block_tail(x, a, scale, bias, w1, b1, w2, b2)
    return out, (x, a, scale, bias, w1, b1, w2, b2)


def _bt_bwd(res, g):
    out, vjp = jax.vjp(_tail_xla, *res)
    return vjp(g.astype(out.dtype))


block_tail.defvjp(_bt_fwd, _bt_bwd)
