"""Fused Pallas kernel for the SAM mask upscale + hypernetwork contraction.

The reference upscaling stack (sam/modeling/mask_decoder.py:53-59,163-169)
is two 2x2-stride-2 transposed convs with LayerNorm2d + GELU between, then
``masks = hyper_in @ upscaled``. At 256 prompts x 1024^2 that path writes
~3 GB of intermediates (y1 at 128^2 x 64, y2 at 256^2 x 32) per decode
chunk. A 2x2/2 VALID transposed conv is exactly a per-site matmul
(out[2i+di, 2j+dj, co] = x[i, j] @ K[di, dj, co, :]; verified bit-exact
against flax ConvTranspose(transpose_kernel=True)), so the whole stack
collapses to three chained matmuls per keys block, entirely in VMEM:

  y1 = x @ W1_flat  (C -> 4*64, cols ordered (di, dj, co))
  grouped LayerNorm2d over each 64-chunk (group sums via one static-matrix
  matmul — no (.., 64)-minor tensor in HBM), tanh-GELU
  y2 = y1 @ blockdiag(W2_flat)  (4*64 -> 4*128, cols (di, dj, ei, ej, co))
  tanh-GELU, masks_flat = y2 @ Hbd[b]  (per-prompt hypernetwork matrix)

writing only the (B, HW, 64) flat mask logits (cols (t, di, ei, dj, ej));
the caller rearranges them to (B, M, 4H, 4W) with one small transpose.
Custom VJP recomputes through the XLA-equivalent ``masks_upscale_xla``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=None)
def _group_sum_matrix(width: int, group: int):
    """(width, width) with 1s inside each contiguous `group`-sized block."""
    n = width // group
    return np.kron(np.eye(n, dtype=np.float32),
                   np.ones((group, group), np.float32))


def _flat_w1(k1: jax.Array) -> jax.Array:
    """(2, 2, co, cin) ConvT kernel -> (cin, 4*co), cols (di, dj, co)."""
    co = k1.shape[2]
    return k1.transpose(3, 0, 1, 2).reshape(k1.shape[3], 4 * co)


def _blockdiag_w2(k2: jax.Array) -> jax.Array:
    """(2, 2, co, cin) -> (4*cin, 4*(4*co)) = kron(I4, W2_flat)."""
    cin = k2.shape[3]
    w2 = k2.transpose(3, 0, 1, 2).reshape(cin, 4 * k2.shape[2])
    eye = jnp.eye(4, dtype=w2.dtype)
    return jnp.einsum("gh,ro->grho", eye, w2).reshape(4 * cin, 4 * w2.shape[1])


def _hyper_matrix(hyper: jax.Array, co2: int) -> jax.Array:
    """hyper (B, M, co2) -> Hbd (B, 4*4*co2, M*16) with
    Hbd[b, g*4*co2 + e*co2 + c, t*16 + di*8 + ei*4 + dj*2 + ej] =
    hyper[b, t, c] for the (di,dj)=g, (ei,ej)=e matching the column."""
    b, m, _ = hyper.shape
    g = np.arange(4)[:, None, None, None]   # (di,dj) block
    e = np.arange(4)[None, :, None, None]   # (ei,ej) block
    c = np.arange(co2)[None, None, :, None]
    t = np.arange(m)[None, None, None, :]
    di, dj = g // 2, g % 2
    ei, ej = e // 2, e % 2
    rows = (g * 4 * co2 + e * co2 + c + 0 * t).ravel()
    cols = (t * 16 + di * 8 + ei * 4 + dj * 2 + ej + 0 * c).ravel()
    vals_t = np.broadcast_to(t, (4, 4, co2, m)).ravel()
    vals_c = np.broadcast_to(c, (4, 4, co2, m)).ravel()
    out = jnp.zeros((b, 16 * co2, m * 16), hyper.dtype)
    return out.at[:, rows, cols].set(hyper[:, vals_t, vals_c])


def _ln2d_grouped(y: jax.Array, msum: jax.Array, w_flat, b_flat,
                  group: int, eps: float = 1e-6):
    """Grouped LayerNorm2d on flat (rows, n_groups*group) activations;
    per-group stats broadcast via the static group-sum matrix (fp32)."""
    yf = y.astype(jnp.float32)
    gsum = jnp.dot(yf, msum, preferred_element_type=jnp.float32)
    mean = gsum / group
    g2 = jnp.dot(yf * yf, msum, preferred_element_type=jnp.float32)
    var = g2 / group - mean * mean
    out = (yf - mean) * jax.lax.rsqrt(var + eps)
    return out * w_flat + b_flat


def masks_upscale_xla(keys, k1, b1, lnw, lnb, k2, b2, hyper):
    """XLA oracle / backward: flat-matmul formulation of the upscale stack.

    keys (B, HW, C); k1 (2,2,C/4,C), b1 (C/4); lnw/lnb (C/4);
    k2 (2,2,C/8,C/4), b2 (C/8); hyper (B, M, C/8).
    Returns flat mask logits (B, HW, M*16) fp32, cols (t, di, ei, dj, ej).
    """
    dt = keys.dtype
    c4, c8 = k1.shape[2], k2.shape[2]
    w1 = _flat_w1(k1).astype(dt)
    y1 = keys @ w1 + jnp.tile(b1, 4).astype(dt)
    msum = jnp.asarray(_group_sum_matrix(4 * c4, c4))
    y1 = _ln2d_grouped(y1, msum, jnp.tile(lnw, 4), jnp.tile(lnb, 4), c4)
    y1 = jax.nn.gelu(y1.astype(dt), approximate=(dt == jnp.bfloat16))
    w2 = _blockdiag_w2(k2).astype(dt)
    y2 = y1 @ w2 + jnp.tile(b2, 16).astype(dt)
    y2 = jax.nn.gelu(y2, approximate=(dt == jnp.bfloat16))
    hbd = _hyper_matrix(hyper.astype(dt), c8)
    out = jnp.einsum("bnr,brk->bnk", y2, hbd,
                     preferred_element_type=jnp.float32)
    # Mask logits are STORED in the working dtype: fp32 keeps the parity
    # path exact; in bf16 serving the flat logits tensor (B, HW, M*16) is
    # the largest decode write (268 MB/chunk fp32 at 1024^2 x 256 prompts)
    # and bf16 rounding (~0.4% rel) is far below the 0-threshold margin.
    return out.astype(dt if dt == jnp.bfloat16 else jnp.float32)


def _upscale_kernel(x_ref, w1_ref, b1_ref, lnw_ref, lnb_ref, msum_ref,
                    w2_ref, b2_ref, hbd_ref, o_ref, *, c4: int, bp: int):
    f32 = jnp.float32
    for j in range(bp):
        x = x_ref[j]
        dt = x.dtype
        approx = dt == jnp.bfloat16
        y1 = jnp.dot(x, w1_ref[...], preferred_element_type=f32).astype(dt)
        y1 = y1 + b1_ref[...]
        y1 = _ln2d_grouped(y1, msum_ref[...], lnw_ref[...].astype(f32),
                           lnb_ref[...].astype(f32), c4)
        y1 = jax.nn.gelu(y1.astype(dt), approximate=approx)
        y2 = jnp.dot(y1, w2_ref[...], preferred_element_type=f32).astype(dt)
        y2 = y2 + b2_ref[...]
        y2 = jax.nn.gelu(y2, approximate=approx)
        o_ref[j] = jnp.dot(y2, hbd_ref[j],
                           preferred_element_type=f32).astype(o_ref.dtype)


def _upscale_forward(keys, k1, b1, lnw, lnb, k2, b2, hyper):
    b, n, c = keys.shape
    c4, c8 = k1.shape[2], k2.shape[2]
    m = hyper.shape[1]
    dt = keys.dtype
    w1 = _flat_w1(k1).astype(dt)
    b1f = jnp.tile(b1, 4).reshape(1, -1).astype(dt)
    lnwf = jnp.tile(lnw, 4).reshape(1, -1).astype(jnp.float32)
    lnbf = jnp.tile(lnb, 4).reshape(1, -1).astype(jnp.float32)
    msum = jnp.asarray(_group_sum_matrix(4 * c4, c4))
    w2 = _blockdiag_w2(k2).astype(dt)
    b2f = jnp.tile(b2, 16).reshape(1, -1).astype(dt)
    hbd = _hyper_matrix(hyper.astype(dt), c8)
    block = min(2048, n)
    assert n % block == 0, (n, block)
    # Prompt blocking measured NEGATIVE here (v5e, 256-prompt chunk: bp=4
    # regresses the full decode 13.4 -> 14.4 ms despite 4x fewer grid
    # steps — the larger live blocks starve the (bb, nb) pipeline; this
    # kernel is MXU-dense per step, unlike the two-way kernels). Keep 1.
    bp = 1
    out = pl.pallas_call(
        functools.partial(_upscale_kernel, c4=c4, bp=bp),
        grid=(b // bp, n // block),
        in_specs=[
            pl.BlockSpec((bp, block, c), lambda bb, nb: (bb, nb, 0)),
            pl.BlockSpec(w1.shape, lambda bb, nb: (0, 0)),
            pl.BlockSpec(b1f.shape, lambda bb, nb: (0, 0)),
            pl.BlockSpec(lnwf.shape, lambda bb, nb: (0, 0)),
            pl.BlockSpec(lnbf.shape, lambda bb, nb: (0, 0)),
            pl.BlockSpec(msum.shape, lambda bb, nb: (0, 0)),
            pl.BlockSpec(w2.shape, lambda bb, nb: (0, 0)),
            pl.BlockSpec(b2f.shape, lambda bb, nb: (0, 0)),
            pl.BlockSpec((bp, *hbd.shape[1:]), lambda bb, nb: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bp, block, m * 16),
                               lambda bb, nb: (bb, nb, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (b, n, m * 16), dt if dt == jnp.bfloat16 else jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(keys, w1, b1f, lnwf, lnbf, msum, w2, b2f, hbd)
    return out


@jax.custom_vjp
def masks_upscale(keys, k1, b1, lnw, lnb, k2, b2, hyper):
    """Fused upscale + hypernetwork mask logits (see module docstring)."""
    return _upscale_forward(keys, k1, b1, lnw, lnb, k2, b2, hyper)


def _fwd(keys, k1, b1, lnw, lnb, k2, b2, hyper):
    return _upscale_forward(keys, k1, b1, lnw, lnb, k2, b2, hyper), (
        keys, k1, b1, lnw, lnb, k2, b2, hyper)


def _bwd(res, g):
    _, vjp = jax.vjp(masks_upscale_xla, *res)
    return vjp(g)


masks_upscale.defvjp(_fwd, _bwd)


def unflatten_masks(flat: jax.Array, h: int, w: int, m: int) -> jax.Array:
    """(B, H*W, M*16) cols (t, di, ei, dj, ej) -> (B, M, 4H, 4W)."""
    b = flat.shape[0]
    x = flat.reshape(b, h, w, m, 2, 2, 2, 2)
    x = x.transpose(0, 3, 1, 4, 5, 2, 6, 7)
    return x.reshape(b, m, 4 * h, 4 * w)
