"""Fused windowed attention with in-VMEM decomposed rel-pos bias.

The SAM ViT's 8 windowed blocks (25 windows x 12 heads x 196 tokens at
1024^2) spend more time building the rel-pos bias than attending: the
augmented-matmul path (ops/rel_pos_attention.py) materializes fp32 5-D
tensors with minor dim 14 (XLA pads minor dims to 128 lanes), builds
92-wide concatenated q/k tensors, and round-trips the (N, N) fp32 score
tensor through HBM. Measured per block (v5e, bf16, scripts/
profile_window.py): augment alone ~355 us, attention core ~123 us.

This kernel keeps everything per (window, head) in VMEM and builds the
bias with static selector matmuls (all 2-D, MXU-friendly):

    bias[q=(qh,qw), k=(kh,kw)] = <q, Rh[qh, kh]> + <q, Rw[qw, kw]>

    M1h  = q @ RhT                  (N, N)   RhT[c, (s,kh)] = Rh[s,kh,c]
    relh = (M1h * maskH) @ CH       (N, win) maskH: 1[s == qh(row)]
    s    = (q @ k^T) * scale + relh @ EH + relw @ EW
    out  = softmax(s) @ v           (exact fp32 row softmax)

CH collapses the masked (s, kh) columns to kh; EH broadcasts kh over kw
columns (and symmetrically for the w axis). Semantics match the reference
decomposed bias exactly (/root/reference/sam/modeling/image_encoder.py:
340-376); parity + grad tests in tests/test_attention_ops.py.

Backward: custom VJP recomputing through the augmented-matmul XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=None)
def _bias_consts(win: int):
    """Static selector/mask matrices for one (win x win) window."""
    n = win * win
    q = np.arange(n)
    col = np.arange(n)
    qh, qw = q // win, q % win
    s, kh = col // win, col % win  # for the (s, kh)/(s, kw) column spaces
    maskH = (s[None, :] == qh[:, None]).astype(np.float32)      # (N, N)
    maskW = (s[None, :] == qw[:, None]).astype(np.float32)      # (N, N)
    CH = (kh[:, None] == np.arange(win)[None, :]).astype(np.float32)  # (N, w)
    CW = CH.copy()                                               # same layout
    EH = (np.arange(win)[:, None] == (col // win)[None, :]).astype(np.float32)
    EW = (np.arange(win)[:, None] == (col % win)[None, :]).astype(np.float32)
    return maskH, maskW, CH, CW, EH, EW


def _window_kernel(q_ref, kt_ref, v_ref, rht_ref, rwt_ref,
                   mh_ref, mw_ref, ch_ref, eh_ref, ew_ref, o_ref, *,
                   wps: int, heads: int, scale: float):
    f32 = jnp.float32
    mh = mh_ref[...]
    mw = mw_ref[...]
    ch = ch_ref[...]
    eh = eh_ref[...]
    ew = ew_ref[...]
    rht = rht_ref[...]
    rwt = rwt_ref[...]
    for wi in range(wps):
        for h in range(heads):
            qh = q_ref[wi, h]                                   # (N, D)
            # K arrives pre-transposed (D, N): an in-kernel .T would cost a
            # Mosaic relayout per (window, head) iteration.
            m1h = jnp.dot(qh, rht, preferred_element_type=f32) * mh
            relh = jnp.dot(m1h, ch, preferred_element_type=f32)  # (N, win)
            m1w = jnp.dot(qh, rwt, preferred_element_type=f32) * mw
            relw = jnp.dot(m1w, ch, preferred_element_type=f32)
            s = jnp.dot(qh, kt_ref[wi, h], preferred_element_type=f32) * scale
            s = s + jnp.dot(relh, eh, preferred_element_type=f32)
            s = s + jnp.dot(relw, ew, preferred_element_type=f32)
            mx = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - mx)
            p = (e / e.sum(axis=-1, keepdims=True)).astype(v_ref.dtype)
            o_ref[wi, h] = jnp.dot(
                p, v_ref[wi, h], preferred_element_type=f32
            ).astype(o_ref.dtype)


def _window_forward(q, k, v, Rh, Rw, win: int):
    b, heads, n, d = q.shape
    assert n == win * win, (n, win)
    scale = d ** -0.5
    # windows per grid step: amortize the ~3-5 us per-step cost without
    # blowing VMEM (q/k/v/out blocks are wps * heads * N * D each).
    wps = 1
    for cand in (8, 5, 4, 3, 2):
        if b % cand == 0:
            wps = cand
            break
    maskH, maskW, CH, _, EH, EW = _bias_consts(win)
    dt = q.dtype
    rht = Rh.transpose(2, 0, 1).reshape(d, n).astype(dt)  # [c, (s, kh)]
    rwt = Rw.transpose(2, 0, 1).reshape(d, n).astype(dt)  # [c, (s, kw)]
    consts = [rht, rwt,
              jnp.asarray(maskH), jnp.asarray(maskW),
              jnp.asarray(CH), jnp.asarray(EH), jnp.asarray(EW)]
    bspec = lambda: pl.BlockSpec((wps, heads, n, d),
                                 lambda i: (i, 0, 0, 0))
    ktspec = pl.BlockSpec((wps, heads, d, n), lambda i: (i, 0, 0, 0))
    cspec = lambda x: pl.BlockSpec(x.shape, lambda i: (0,) * x.ndim)
    kt = k.transpose(0, 1, 3, 2)  # (B, H, D, N): no in-kernel transposes
    return pl.pallas_call(
        functools.partial(_window_kernel, wps=wps, heads=heads, scale=scale),
        grid=(b // wps,),
        in_specs=[bspec(), ktspec, bspec()] + [cspec(x) for x in consts],
        out_specs=bspec(),
        out_shape=jax.ShapeDtypeStruct((b, heads, n, d), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(q, kt, v, *consts)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def window_rel_attention(q, k, v, rel_pos_h, rel_pos_w, hw):
    """Fused windowed attention with decomposed rel-pos bias.

    q, k, v: (B, heads, N, d), N == win^2 with hw == (win, win).
    rel_pos_h/rel_pos_w: stored (2*win-1, d) tables. Returns (B, heads, N, d).
    """
    from ..rel_pos_attention import rel_pos_table

    win = hw[0]
    assert hw[0] == hw[1], hw
    Rh = rel_pos_table(win, win, rel_pos_h.astype(jnp.float32))
    Rw = rel_pos_table(win, win, rel_pos_w.astype(jnp.float32))
    return _window_forward(q, k, v, Rh, Rw, win)


def _wra_fwd(q, k, v, rel_pos_h, rel_pos_w, hw):
    return window_rel_attention(q, k, v, rel_pos_h, rel_pos_w, hw), (
        q, k, v, rel_pos_h, rel_pos_w)


def _wra_bwd(hw, res, g):
    from ..rel_pos_attention import rel_pos_attention

    q, k, v, rel_pos_h, rel_pos_w = res
    _, vjp = jax.vjp(
        lambda *a: rel_pos_attention(*a, hw=hw, impl="xla"),
        q, k, v, rel_pos_h, rel_pos_w,
    )
    return vjp(g)


window_rel_attention.defvjp(_wra_fwd, _wra_bwd)
