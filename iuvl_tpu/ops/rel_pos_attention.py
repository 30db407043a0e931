"""Windowed / global attention with decomposed relative-position bias.

This is the hot op of the SAM ViT backbone. Semantics match the reference
(/root/reference/sam/modeling/image_encoder.py:239-376): scores are
``(q * scale) @ k^T`` plus a decomposed bias built from per-axis relative
position tables indexed by *unscaled* q, softmaxed in fp32.

Two implementations share one interface:
- ``impl='xla'``   : pure jnp — the correctness oracle, and already fast on
                     the MXU because everything is batched matmuls.
- ``impl='pallas'``: fused Pallas kernel (ops/pallas/flash_attention.py) that
                     keeps the (N x N) score matrix in VMEM.

All shapes are static; the rel-pos gather tables are computed at trace time
with static indices so XLA constant-folds them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def rel_pos_table(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Select relative-position embeddings for a (q_size, k_size) grid pair.

    Reference: sam/modeling/image_encoder.py:307-337 (get_rel_pos). The
    linear-interpolation resize branch is applied when the stored table
    length does not match 2*max(q,k)-1.
    Returns (q_size, k_size, head_dim).
    """
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear"
        )
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel_coords = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return jnp.take(rel_pos, rel_coords.astype(np.int32), axis=0)


def decomposed_rel_pos_bias(
    q: jax.Array, rel_pos_h: jax.Array, rel_pos_w: jax.Array, hw: tuple[int, int]
) -> jax.Array:
    """Decomposed rel-pos bias (MViTv2 style).

    q: (B, heads, H*W, head_dim) *unscaled* queries.
    Returns bias (B, heads, H*W, H*W).
    Reference: sam/modeling/image_encoder.py:340-376.
    """
    h, w = hw
    Rh = rel_pos_table(h, h, rel_pos_h)  # (h, h, d)
    Rw = rel_pos_table(w, w, rel_pos_w)  # (w, w, d)
    b, heads, _, d = q.shape
    r_q = q.reshape(b, heads, h, w, d)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh)
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw)
    bias = rel_h[..., :, None] + rel_w[..., None, :]  # (b, n, h, w, h, w)
    return bias.reshape(b, heads, h * w, h * w)


def augment_qk_rel_pos(
    q: jax.Array, k: jax.Array, rel_pos_h: jax.Array, rel_pos_w: jax.Array,
    hw: tuple[int, int],
):
    """Fold the decomposed rel-pos bias into the QK matmul.

    bias[q, k] = <Rh[qh], q_h> + <Rw[qw], q_w> depends on k only through
    (kh, kw) — i.e. it's the inner product of per-query features
    [rel_h_q (h dims), rel_w_q (w dims)] with per-key indicator features
    [onehot(kh), onehot(kw)]. Augmenting Q with those features and K with
    the indicators makes ``softmax(Q_aug K_aug^T)`` EXACTLY equal to
    ``softmax(q*scale @ k^T + bias)`` — no (N, N) bias tensor, pure MXU
    matmuls, and any vanilla flash-attention kernel applies.

    Returns (q_aug, k_aug): (B, heads, N, d + h + w).
    """
    h, w = hw
    b, heads, n, d = q.shape
    scale = d ** -0.5
    Rh = rel_pos_table(h, h, rel_pos_h.astype(jnp.float32))  # (h, h, d)
    Rw = rel_pos_table(w, w, rel_pos_w.astype(jnp.float32))  # (w, w, d)
    r_q = q.astype(jnp.float32).reshape(b, heads, h, w, d)
    rel_h_q = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh).reshape(b, heads, n, h)
    rel_w_q = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw).reshape(b, heads, n, w)

    eye_h = jnp.eye(h, dtype=q.dtype)
    eye_w = jnp.eye(w, dtype=q.dtype)
    onehot_kh = jnp.repeat(eye_h, w, axis=0)  # (N, h): row i -> onehot(i // w)
    onehot_kw = jnp.tile(eye_w, (h, 1))  # (N, w): row i -> onehot(i % w)
    k_aug = jnp.concatenate(
        [
            k,
            jnp.broadcast_to(onehot_kh[None, None], (b, heads, n, h)),
            jnp.broadcast_to(onehot_kw[None, None], (b, heads, n, w)),
        ],
        axis=-1,
    )
    q_aug = jnp.concatenate(
        [q * scale, rel_h_q.astype(q.dtype), rel_w_q.astype(q.dtype)], axis=-1
    )
    return q_aug, k_aug


def _rowbias_route(q, k, v, rel_pos_h, rel_pos_w, hw):
    """relw folded into the K=128-padded qk contraction (free lanes),
    relh as in-kernel VPU adds — no bias matmul at all. See the section
    comment in ops/pallas/flash_attention.py."""
    from .pallas.flash_attention import flash_attention_rowbias

    h, w = hw
    b, heads, n, d = q.shape
    Rh = rel_pos_table(h, h, rel_pos_h.astype(jnp.float32))
    Rw = rel_pos_table(w, w, rel_pos_w.astype(jnp.float32))
    r_q = q.astype(jnp.float32).reshape(b, heads, h, w, d)
    relh = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh).reshape(
        b, heads, n, h).astype(q.dtype)
    relw = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw).reshape(
        b, heads, n, w).astype(q.dtype)
    return flash_attention_rowbias(q * (d ** -0.5), k, v, relh, relw, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _global_attention_gradswitch(q, k, v, rel_pos_h, rel_pos_w, hw):
    """Implementation-by-differentiation dispatch for global blocks: the
    primal body (runs when NOT differentiated — serving/eval) uses the
    rowbias kernel; the fwd/bwd rules (run under jax.grad — training) use
    the augmented flash path, whose fwd+bwd measures faster. Both compute
    the same function (each parity-tested vs the materialized oracle)."""
    return _rowbias_route(q, k, v, rel_pos_h, rel_pos_w, hw)


def _gradswitch_fwd(q, k, v, rel_pos_h, rel_pos_w, hw):
    out, pullback = jax.vjp(
        lambda q_, k_, v_, rh_, rw_: rel_pos_attention(
            q_, k_, v_, rh_, rw_, hw, impl="pallas"),
        q, k, v, rel_pos_h, rel_pos_w)
    return out, pullback


def _gradswitch_bwd(hw, pullback, g):
    return pullback(g)


_global_attention_gradswitch.defvjp(_gradswitch_fwd, _gradswitch_bwd)


def _attn_then_proj(q, k, v, rel_pos_h, rel_pos_w, wo, bo, hw, impl):
    """Unfused composition: attention, head-major -> token-major relayout,
    output projection. The oracle (and non-TPU path) for the fused route."""
    out = rel_pos_attention(q, k, v, rel_pos_h, rel_pos_w, hw, impl=impl)
    b, heads, n, d = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, n, heads * d)
    return out @ wo + bo


def _rowbias_proj_route(q, k, v, rel_pos_h, rel_pos_w, wo, bo, hw):
    from .pallas.flash_attention import flash_attention_rowbias_proj

    h, w = hw
    b, heads, n, d = q.shape
    Rh = rel_pos_table(h, h, rel_pos_h.astype(jnp.float32))
    Rw = rel_pos_table(w, w, rel_pos_w.astype(jnp.float32))
    r_q = q.astype(jnp.float32).reshape(b, heads, h, w, d)
    relh = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh).reshape(
        b, heads, n, h).astype(q.dtype)
    relw = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw).reshape(
        b, heads, n, w).astype(q.dtype)
    return flash_attention_rowbias_proj(
        q * (d ** -0.5), k, v, relh, relw, wo, bo, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _global_attention_proj_gradswitch(q, k, v, rel_pos_h, rel_pos_w, wo, bo,
                                      hw):
    """Grad-switching dispatch for global blocks INCLUDING the output
    projection: the primal body (serving/eval) runs the fused
    rowbias+projection kernel — the (b, heads, n, d) attention output and
    its head-major relayout never touch HBM; the fwd/bwd rules (training)
    run the augmented flash path + XLA projection, whose fwd+bwd measures
    faster (see _global_attention_gradswitch)."""
    return _rowbias_proj_route(q, k, v, rel_pos_h, rel_pos_w, wo, bo, hw)


def _proj_gradswitch_fwd(q, k, v, rel_pos_h, rel_pos_w, wo, bo, hw):
    out, pullback = jax.vjp(
        lambda q_, k_, v_, rh_, rw_, wo_, bo_: _attn_then_proj(
            q_, k_, v_, rh_, rw_, wo_, bo_, hw, "pallas"),
        q, k, v, rel_pos_h, rel_pos_w, wo, bo)
    return out, pullback


def _proj_gradswitch_bwd(hw, pullback, g):
    return pullback(g)


_global_attention_proj_gradswitch.defvjp(
    _proj_gradswitch_fwd, _proj_gradswitch_bwd)


def rel_pos_attention_proj(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_pos_h: jax.Array,
    rel_pos_w: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    hw: tuple[int, int],
    impl: str = "xla",
) -> jax.Array:
    """Rel-pos attention + output projection in one op: returns
    ``(b, n, heads*d_v) @ wo + bo`` in token-major (b, n, C) layout.

    For global blocks under impl='auto' on supported shapes this runs the
    fused rowbias+projection Pallas kernel when not differentiated (the
    relayout between attention and projection — measured at 0.79 ms/block,
    the largest global-block piece — never materializes) and the augmented
    flash path + XLA projection under jax.grad. All other impls compose
    rel_pos_attention with the explicit relayout + matmul, numerics
    unchanged."""
    n = q.shape[2]
    if impl == "auto" and n >= 1024:
        from .pallas.flash_attention import rowbias_supported

        if rowbias_supported(n, q.shape[-1], hw):
            return _global_attention_proj_gradswitch(
                q, k, v, rel_pos_h, rel_pos_w, wo, bo, hw)
        return _attn_then_proj(q, k, v, rel_pos_h, rel_pos_w, wo, bo, hw,
                               "pallas")
    return _attn_then_proj(q, k, v, rel_pos_h, rel_pos_w, wo, bo, hw, impl)


def rel_pos_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_pos_h: jax.Array,
    rel_pos_w: jax.Array,
    hw: tuple[int, int],
    impl: str = "xla",
) -> jax.Array:
    """Attention with decomposed rel-pos bias over a (h, w) token grid.

    q, k, v: (B, heads, N, head_dim) with N == h*w. Returns (B, heads, N, d).
    impl: 'xla' (augmented matmuls), 'xla_naive' (materialized bias oracle),
    'pallas' (fused flash kernel on augmented qk), 'rowbias' (flash with
    relw folded into the qk matmul's free K-pad lanes and relh as in-kernel
    VPU adds — fastest forward, slower fwd+bwd), 'pallas_rp' (flash with
    the bias folded in-kernel — measured slower, see the negative-result
    note below), 'window' (fused windowed kernel building the bias in VMEM,
    ops/pallas/window_attention.py),
    'auto' (global blocks N >= 1024: grad-switching dispatch — rowbias when
    not differentiated, the augmented pallas kernel under jax.grad, each
    where it measures faster on v5e; the window kernel for square windows
    on a TPU backend — the augment path's fp32 minor-dim-14 tensors and
    dim-92 concats cost more than the whole attention there; xla otherwise).
    """
    if impl == "xla_naive":
        return _rel_pos_attention_naive(q, k, v, rel_pos_h, rel_pos_w, hw)
    n = q.shape[2]
    if impl == "auto":
        if n >= 1024:
            from .pallas.flash_attention import rowbias_supported

            if rowbias_supported(n, q.shape[-1], hw):
                # Grad-switching dispatch: the rowbias kernel wins
                # forward-only (0.63 vs 1.16 ms/block at 1024^2 bf16) but
                # loses fwd+bwd (4.67 vs 4.29 ms — the relh/relw einsum
                # VJPs outweigh the kernel saving), so inference runs the
                # primal body (rowbias) and differentiation runs the
                # custom_vjp fwd rule (augmented flash) instead.
                return _global_attention_gradswitch(
                    q, k, v, rel_pos_h, rel_pos_w, hw)
            impl = "pallas"
        elif hw[0] == hw[1] and jax.default_backend() == "tpu":
            impl = "window"
        else:
            impl = "xla"
    if impl == "window":
        from .pallas.window_attention import window_rel_attention

        return window_rel_attention(q, k, v, rel_pos_h, rel_pos_w, hw)
    if impl == "rowbias":
        return _rowbias_route(q, k, v, rel_pos_h, rel_pos_w, hw)
    if impl == "pallas_rp":
        # NEGATIVE RESULT (v5e, 2026-08): decomposed bias folded INTO the
        # flash kernel — q/k stay head_dim wide and the bias is two small
        # rel @ one-hot-expander matmuls per (q, k) block. Measured WORSE
        # than the augmented route in the full encode (14.7/15.0 ms vs
        # 14.1/14.0 ms interleaved A/B): the bias contraction over h+w=128
        # dims costs exactly what augmentation folds into its single QK
        # matmul — augmentation only pays the 192->256 lane pad, while this
        # variant pays the same contraction in worse-shaped K=64 matmuls
        # plus per-block f32 adds. Kept selectable + parity/grad-tested
        # (tests/test_attention_ops.py::test_relpos_flash_*).
        from .pallas.flash_attention import flash_attention_relpos

        h, w = hw
        b, heads, n, d = q.shape
        Rh = rel_pos_table(h, h, rel_pos_h.astype(jnp.float32))
        Rw = rel_pos_table(w, w, rel_pos_w.astype(jnp.float32))
        r_q = q.astype(jnp.float32).reshape(b, heads, h, w, d)
        relh = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh).reshape(
            b, heads, n, h).astype(q.dtype)
        relw = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw).reshape(
            b, heads, n, w).astype(q.dtype)
        col = np.arange(n)
        eh = jnp.asarray((np.arange(h)[:, None] == col[None] // w)
                         .astype(np.float32))
        ew = jnp.asarray((np.arange(w)[:, None] == col[None] % w)
                         .astype(np.float32))
        return flash_attention_relpos(
            q * (d ** -0.5), k, v, relh, relw, eh, ew)
    q_aug, k_aug = augment_qk_rel_pos(q, k, rel_pos_h, rel_pos_w, hw)
    if impl == "pallas":
        from .pallas.flash_attention import flash_attention

        return flash_attention(
            q_aug, k_aug, v, softmax_scale=1.0, block_q=2048, block_k=1024
        )
    attn = jnp.einsum(
        "bnqd,bnkd->bnqk", q_aug, k_aug, preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bnqk,bnkd->bnqd", attn, v)


def _rel_pos_attention_naive(q, k, v, rel_pos_h, rel_pos_w, hw):
    """Materialized-bias oracle (matches reference math step by step)."""
    d = q.shape[-1]
    scale = d ** -0.5
    attn = jnp.einsum(
        "bnqd,bnkd->bnqk", q * scale, k, preferred_element_type=jnp.float32
    )
    attn = attn + decomposed_rel_pos_bias(
        q.astype(jnp.float32), rel_pos_h.astype(jnp.float32),
        rel_pos_w.astype(jnp.float32), hw,
    )
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bnqk,bnkd->bnqd", attn, v)
