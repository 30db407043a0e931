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

Backward: fused Pallas backward kernel (round-4, VERDICT r3 item 1): one
call recomputes the chunk forward in VMEM and emits dx (== da) plus all six
parameter grads, with the weight-grad accumulators resident in VMEM across
row-chunk grid steps — the (R, 4C) hidden and its cotangent never touch
HBM. Falls back to the XLA-vjp route off-TPU or for odd row counts.
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


def _gelu_grad_f32(hf):
    """d gelu(x)/dx in fp32 for the tanh approximation (the bf16 forward's
    formula; see _gelu)."""
    c = 0.7978845608028654  # sqrt(2/pi)
    a = 0.044715
    inner = c * (hf + a * hf * hf * hf)
    t = jnp.tanh(inner)
    dinner = c * (1.0 + 3.0 * a * hf * hf)
    return 0.5 * (1.0 + t) + 0.5 * hf * (1.0 - t * t) * dinner


def _gelu_grad_exact_f32(hf):
    """d gelu(x)/dx in fp32 for the exact erf formulation (fp32 forward)."""
    cdf = 0.5 * (1.0 + jax.lax.erf(hf / jnp.sqrt(jnp.float32(2.0))))
    pdf = jnp.exp(-0.5 * hf * hf) / jnp.sqrt(jnp.float32(2.0 * jnp.pi))
    return cdf + hf * pdf


def _tail_bwd_kernel(x_ref, a_ref, g_ref, sc_ref, bi_ref, w1_ref, b1_ref,
                     w2_ref, b2_ref,
                     dxa_ref, dsc_ref, dbi_ref, dw1_ref, db1_ref, dw2_ref,
                     db2_ref, *, eps: float, approx_gelu: bool):
    f32 = jnp.float32
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dbi_ref[...] = jnp.zeros_like(dbi_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dt = x_ref.dtype
    scale = sc_ref[...]
    bias = bi_ref[...]
    w1 = w1_ref[...]
    w2 = w2_ref[...]

    # ---- forward recompute (chunk-local, all in VMEM) ---- #
    x1 = x_ref[...] + a_ref[...]                     # (R, C) storage dtype
    xf = x1.astype(f32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(axis=-1, keepdims=True) - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd                          # (R, C) f32
    y = (xhat * scale + bias).astype(dt)
    hpre_f = jnp.dot(y, w1, preferred_element_type=f32)
    hpre = hpre_f.astype(dt) + b1_ref[...].astype(dt)
    hpre_f = hpre.astype(f32)
    if approx_gelu:
        h = _gelu(hpre)
        gg = _gelu_grad_f32(hpre_f)
    else:
        h = _gelu(hpre)
        gg = _gelu_grad_exact_f32(hpre_f)

    # ---- backward ---- #
    g = g_ref[...]                                    # (R, C) storage dtype
    gf = g.astype(f32)
    db2_ref[...] += jnp.sum(gf, axis=0, keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(
        h, g, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )  # (H, C)
    dh = jax.lax.dot_general(
        g, w2, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )  # (R, H) f32
    dhpre = (dh * gg).astype(dt)                      # (R, H)
    db1_ref[...] += jnp.sum(dhpre.astype(f32), axis=0, keepdims=True)
    dw1_ref[...] += jax.lax.dot_general(
        y, dhpre, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )  # (C, H)
    dy = jax.lax.dot_general(
        dhpre, w1, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )  # (R, C) f32
    dsc_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbi_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    # LayerNorm input grad (fp32): d_xf = rstd * (dys - mean(dys)
    #   - xhat * mean(dys * xhat)), dys = dy * scale.
    dys = dy * scale
    m1 = dys.mean(axis=-1, keepdims=True)
    m2 = (dys * xhat).mean(axis=-1, keepdims=True)
    dxf = rstd * (dys - m1 - xhat * m2)
    dxa_ref[...] = g + dxf.astype(dt)                 # d_x == d_a


def _tail_backward(x, a, scale, bias, w1, b1, w2, b2, g, eps):
    t, c = x.shape
    h = w1.shape[1]
    rows = 256
    while rows > 8 and t % rows:
        rows //= 2
    dt = x.dtype
    sc = scale.astype(jnp.float32).reshape(1, c)
    bi = bias.astype(jnp.float32).reshape(1, c)
    w1c, b1c = w1.astype(dt), b1.astype(jnp.float32).reshape(1, h)
    w2c, b2c = w2.astype(dt), b2.astype(jnp.float32).reshape(1, c)
    xspec = pl.BlockSpec((rows, c), lambda i: (i, 0))
    cspec = lambda p: pl.BlockSpec(p.shape, lambda i: (0,) * p.ndim)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_tail_bwd_kernel, eps=eps,
                          approx_gelu=(dt == jnp.bfloat16)),
        grid=(t // rows,),
        in_specs=[xspec, xspec, xspec] + [cspec(p) for p in
                                          (sc, bi, w1c, b1c, w2c, b2c)],
        out_specs=[
            xspec,
            cspec(jnp.zeros((1, c))), cspec(jnp.zeros((1, c))),
            cspec(jnp.zeros((c, h))), cspec(jnp.zeros((1, h))),
            cspec(jnp.zeros((h, c))), cspec(jnp.zeros((1, c))),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, c), dt),      # dxa
            jax.ShapeDtypeStruct((1, c), f32),     # dscale
            jax.ShapeDtypeStruct((1, c), f32),     # dbias
            jax.ShapeDtypeStruct((c, h), f32),     # dw1
            jax.ShapeDtypeStruct((1, h), f32),     # db1
            jax.ShapeDtypeStruct((h, c), f32),     # dw2
            jax.ShapeDtypeStruct((1, c), f32),     # db2
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=80 * 1024 * 1024,
        ),
    )(x, a, g, sc, bi, w1c, b1c, w2c, b2c)
    dxa, dsc, dbi, dw1, db1, dw2, db2 = outs
    cast = lambda t_, ref: t_.reshape(ref.shape).astype(ref.dtype)
    return (dxa, dxa, cast(dsc, scale), cast(dbi, bias), cast(dw1, w1),
            cast(db1, b1), cast(dw2, w2), cast(db2, b2))


def _bt_fwd(x, a, scale, bias, w1, b1, w2, b2):
    out = block_tail(x, a, scale, bias, w1, b1, w2, b2)
    return out, (x, a, scale, bias, w1, b1, w2, b2)


def _bt_bwd(res, g):
    x, a, scale, bias, w1, b1, w2, b2 = res
    t = x.shape[0]
    rows = 256
    while rows > 8 and t % rows:
        rows //= 2
    if t % rows:  # mirrors the forward's odd-rows XLA fallback
        out, vjp = jax.vjp(_tail_xla, *res)
        return vjp(g.astype(out.dtype))
    return _tail_backward(x, a, scale, bias, w1, b1, w2, b2,
                          g.astype(x.dtype), 1e-6)


block_tail.defvjp(_bt_fwd, _bt_bwd)
