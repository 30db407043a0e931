"""Attention op equivalence: naive materialized-bias oracle vs the
augmented-matmul XLA path vs the Pallas flash kernel (interpret mode on
CPU). Mirrors the reference's kernel-vs-oracle test strategy (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iuvl_tpu.ops.rel_pos_attention import (
    augment_qk_rel_pos,
    rel_pos_attention,
)


def _inputs(h=5, w=5, heads=2, d=16, b=2, seed=0):
    rs = np.random.RandomState(seed)
    n = h * w
    q = jnp.asarray(rs.randn(b, heads, n, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, heads, n, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, heads, n, d).astype(np.float32))
    rph = jnp.asarray(rs.randn(2 * h - 1, d).astype(np.float32) * 0.1)
    rpw = jnp.asarray(rs.randn(2 * w - 1, d).astype(np.float32) * 0.1)
    return q, k, v, rph, rpw, (h, w)


def test_augmented_matches_naive():
    q, k, v, rph, rpw, hw = _inputs()
    naive = rel_pos_attention(q, k, v, rph, rpw, hw, impl="xla_naive")
    fast = rel_pos_attention(q, k, v, rph, rpw, hw, impl="xla")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), atol=1e-5)


def test_augmented_grad_matches_naive():
    q, k, v, rph, rpw, hw = _inputs(seed=1)

    def loss(impl):
        def f(q_, rph_):
            return rel_pos_attention(q_, k, v, rph_, rpw, hw, impl=impl).sum()

        return jax.grad(f, argnums=(0, 1))(q, rph)

    g_naive = loss("xla_naive")
    g_fast = loss("xla")
    for a, b_ in zip(g_fast, g_naive):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_flash_kernel_interpret_matches_xla():
    from iuvl_tpu.ops.pallas import flash_attention as fa

    q, k, v, rph, rpw, hw = _inputs(seed=2)
    q_aug, k_aug = augment_qk_rel_pos(q, k, rph, rpw, hw)

    ref = jnp.einsum("bnqd,bnkd->bnqk", q_aug, k_aug,
                     preferred_element_type=jnp.float32)
    ref = jax.nn.softmax(ref, axis=-1).astype(v.dtype)
    ref = jnp.einsum("bnqk,bnkd->bnqd", ref, v)

    # Run the kernel in interpreter mode (CPU test env).
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    pl.pallas_call = interp_call
    try:
        fa.pl.pallas_call = interp_call
        out = fa.flash_attention(q_aug, k_aug, v)
    finally:
        pl.pallas_call = orig_call
        fa.pl.pallas_call = orig_call

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_flash_kernel_grad_matches_xla():
    """custom VJP (bwd = XLA recompute) must match grads of the pure-XLA
    augmented path."""
    from iuvl_tpu.ops.pallas import flash_attention as fa

    q, k, v, rph, rpw, hw = _inputs(seed=5)
    q_aug, k_aug = augment_qk_rel_pos(q, k, rph, rpw, hw)

    def xla_loss(q_, k_, v_):
        a = jnp.einsum("bnqd,bnkd->bnqk", q_, k_,
                       preferred_element_type=jnp.float32)
        a = jax.nn.softmax(a, axis=-1).astype(v_.dtype)
        return jnp.einsum("bnqk,bnkd->bnqd", a, v_).sum()

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    fa.pl.pallas_call = interp
    try:
        def pallas_loss(q_, k_, v_):
            return fa.flash_attention(q_, k_, v_).sum()

        g_p = jax.grad(pallas_loss, argnums=(0, 1, 2))(q_aug, k_aug, v)
    finally:
        fa.pl.pallas_call = orig
    g_x = jax.grad(xla_loss, argnums=(0, 1, 2))(q_aug, k_aug, v)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_twoway_fused_kernels_match_unfused():
    """Fused Pallas two-way block kernels (interpret mode) vs the unfused
    module path, sharing ONE param tree (validates _LNParams/_Proj tree
    compatibility with nn.LayerNorm/nn.Dense too)."""
    import jax
    import jax.numpy as jnp
    from iuvl_tpu.models.sam.mask_decoder import TwoWayTransformer
    from iuvl_tpu.ops.pallas import twoway_attention as ta
    import jax.experimental.pallas as pl

    rng = jax.random.PRNGKey(0)
    b, grid, c, t = 3, 8, 256, 7
    emb = jax.random.normal(rng, (b, grid, grid, c), jnp.float32) * 0.5
    pe = jax.random.normal(jax.random.fold_in(rng, 1), (1, grid, grid, c)) * 0.5
    toks = jax.random.normal(jax.random.fold_in(rng, 2), (b, t, c)) * 0.5

    slow = TwoWayTransformer(impl="off")
    fast = TwoWayTransformer(impl="pallas")
    params = slow.init(jax.random.PRNGKey(1), emb, pe, toks)

    ref_q, ref_k = slow.apply(params, emb, pe, toks)

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    ta.pl.pallas_call = interp
    try:
        out_q, out_k = fast.apply(params, emb, pe, toks)
    finally:
        ta.pl.pallas_call = orig

    np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref_q), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref_k), atol=2e-4)

    # batch-1 image embedding fast path through the fused kernels
    ref_q1, ref_k1 = slow.apply(params, emb[:1], pe, toks)
    ta.pl.pallas_call = interp
    try:
        out_q1, out_k1 = fast.apply(params, emb[:1], pe, toks)
    finally:
        ta.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(out_q1), np.asarray(ref_q1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_k1), np.asarray(ref_k1), atol=2e-4)


def test_twoway_fused_grad_matches_unfused():
    """custom VJP (XLA recompute) of the fused kernels vs unfused grads."""
    import jax
    import jax.numpy as jnp
    from iuvl_tpu.models.sam.mask_decoder import TwoWayTransformer
    from iuvl_tpu.ops.pallas import twoway_attention as ta
    import jax.experimental.pallas as pl

    rng = jax.random.PRNGKey(3)
    b, grid, c, t = 2, 8, 256, 7
    emb = jax.random.normal(rng, (b, grid, grid, c), jnp.float32) * 0.5
    pe = jax.random.normal(jax.random.fold_in(rng, 1), (1, grid, grid, c)) * 0.5
    toks = jax.random.normal(jax.random.fold_in(rng, 2), (b, t, c)) * 0.5

    slow = TwoWayTransformer(impl="off")
    fast = TwoWayTransformer(impl="pallas")
    params = slow.init(jax.random.PRNGKey(1), emb, pe, toks)

    def loss(mod):
        def f(p, e):
            q, k = mod.apply(p, e, pe, toks)
            return (q.astype(jnp.float32) ** 2).sum() + (
                k.astype(jnp.float32) ** 2).sum()
        return f

    g_ref = jax.grad(loss(slow), argnums=(0, 1))(params, emb)

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    ta.pl.pallas_call = interp
    try:
        g_fast = jax.grad(loss(fast), argnums=(0, 1))(params, emb)
    finally:
        ta.pl.pallas_call = orig

    flat_r, _ = jax.tree.flatten(g_ref)
    flat_f, _ = jax.tree.flatten(g_fast)
    for a, b_ in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-3, rtol=1e-3)


def test_mask_decoder_fused_upscale_matches_unfused():
    """Fused Pallas upscale+hyper kernel (interpret mode) + flat-matmul
    upscaled-embedding reconstruction vs the unfused ConvTranspose path,
    sharing one param tree."""
    import jax
    import jax.numpy as jnp
    from iuvl_tpu.models.sam.mask_decoder import MaskDecoder
    from iuvl_tpu.ops.pallas import mask_upscale as mu
    import jax.experimental.pallas as pl

    rng = jax.random.PRNGKey(7)
    b, grid, c = 2, 8, 256
    emb = jax.random.normal(rng, (b, grid, grid, c), jnp.float32) * 0.5
    pe = jax.random.normal(jax.random.fold_in(rng, 1), (grid, grid, c)) * 0.5
    sparse = jax.random.normal(jax.random.fold_in(rng, 2), (b, 2, c)) * 0.5
    dense = jax.random.normal(jax.random.fold_in(rng, 3), (b, grid, grid, c)) * 0.1

    slow = MaskDecoder(twoway_impl="off")
    fast = MaskDecoder(twoway_impl="pallas")
    params = slow.init(jax.random.PRNGKey(1), emb, pe, sparse, dense)
    ref = slow.apply(params, emb, pe, sparse, dense)

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    from iuvl_tpu.ops.pallas import twoway_attention as ta
    mu.pl.pallas_call = interp
    ta.pl.pallas_call = interp
    try:
        out = fast.apply(params, emb, pe, sparse, dense)
    finally:
        mu.pl.pallas_call = orig
        ta.pl.pallas_call = orig

    for key_ in ("masks", "iou_pred", "upscaled_embedding", "hyper_in"):
        np.testing.assert_allclose(
            np.asarray(out[key_]), np.asarray(ref[key_]),
            atol=3e-4, rtol=1e-4, err_msg=key_,
        )


def test_window_kernel_interpret_matches_naive():
    """Fused windowed kernel (in-VMEM bias via static selector matmuls) vs
    the materialized-bias oracle."""
    from iuvl_tpu.ops.pallas import window_attention as wa

    q, k, v, rph, rpw, hw = _inputs(h=5, w=5, heads=3, d=16, b=6, seed=11)
    ref = rel_pos_attention(q, k, v, rph, rpw, hw, impl="xla_naive")

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    wa.pl.pallas_call = interp
    try:
        out = rel_pos_attention(q, k, v, rph, rpw, hw, impl="window")
    finally:
        wa.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_window_kernel_grad_matches_xla():
    """custom VJP (bwd = augmented-XLA recompute) vs oracle grads, incl.
    the rel-pos tables."""
    from iuvl_tpu.ops.pallas import window_attention as wa

    q, k, v, rph, rpw, hw = _inputs(h=4, w=4, heads=2, d=16, b=4, seed=12)

    def loss(impl):
        def f(q_, rph_, v_):
            return rel_pos_attention(
                q_, k, v_, rph_, rpw, hw, impl=impl).sum()
        return jax.grad(f, argnums=(0, 1, 2))(q, rph, v)

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    wa.pl.pallas_call = interp
    try:
        g_w = loss("window")
    finally:
        wa.pl.pallas_call = orig
    g_ref = loss("xla_naive")
    for a, b_ in zip(g_w, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_relpos_flash_interpret_matches_naive():
    """Bias-folded flash kernel (impl='pallas' path) vs the materialized
    oracle — the rel @ one-hot-expander block matmuls must reproduce the
    decomposed bias exactly."""
    from iuvl_tpu.ops.pallas import flash_attention as fa

    q, k, v, rph, rpw, hw = _inputs(h=6, w=5, heads=2, d=16, b=2, seed=21)
    ref = rel_pos_attention(q, k, v, rph, rpw, hw, impl="xla_naive")

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    fa.pl.pallas_call = interp
    try:
        out = rel_pos_attention(q, k, v, rph, rpw, hw, impl="pallas_rp")
    finally:
        fa.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_relpos_flash_grad_matches_naive():
    """Fused backward (dq/dk/dv + in-kernel drelh/drelw accumulation) vs
    oracle grads including the rel-pos tables."""
    from iuvl_tpu.ops.pallas import flash_attention as fa

    q, k, v, rph, rpw, hw = _inputs(h=4, w=4, heads=2, d=16, b=2, seed=22)

    def loss(impl):
        def f(q_, k_, v_, rph_, rpw_):
            return rel_pos_attention(
                q_, k_, v_, rph_, rpw_, hw, impl=impl).sum()
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(q, k, v, rph, rpw)

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    fa.pl.pallas_call = interp
    try:
        g_p = loss("pallas_rp")
    finally:
        fa.pl.pallas_call = orig
    g_ref = loss("xla_naive")
    for a, b_ in zip(g_p, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-4)


def _block_inputs(win=5, heads=3, d=16, nw=6, seed=13):
    rs = np.random.RandomState(seed)
    n, c = win * win, heads * d
    xw = jnp.asarray(rs.randn(nw, n, c).astype(np.float32) * 0.5)
    wqkv = jnp.asarray(rs.randn(c, 3 * c).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rs.randn(3 * c).astype(np.float32) * 0.1)
    wo = jnp.asarray(rs.randn(c, c).astype(np.float32) * 0.1)
    bo = jnp.asarray(rs.randn(c).astype(np.float32) * 0.1)
    rph = jnp.asarray(rs.randn(2 * win - 1, d).astype(np.float32) * 0.2)
    rpw = jnp.asarray(rs.randn(2 * win - 1, d).astype(np.float32) * 0.2)
    return xw, wqkv, bqkv, wo, bo, rph, rpw


def test_window_block_kernel_interpret_matches_xla():
    """Whole-attention window kernel (qkv proj + rel-pos attention + out
    proj fused) vs the XLA composition of its tested parts."""
    from iuvl_tpu.ops.pallas import window_block as wb

    win, heads = 5, 3
    xw, wqkv, bqkv, wo, bo, rph, rpw = _block_inputs(win=win, heads=heads)
    ref = wb._block_xla(xw, wqkv, bqkv, wo, bo, rph, rpw, win, heads)

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    wb.pl.pallas_call = interp
    try:
        out = wb.window_attention_block(
            xw, wqkv, bqkv, wo, bo, rph, rpw, win, heads)
    finally:
        wb.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_window_block_kernel_grad_matches_xla():
    from iuvl_tpu.ops.pallas import window_block as wb

    win, heads = 4, 2
    xw, wqkv, bqkv, wo, bo, rph, rpw = _block_inputs(
        win=win, heads=heads, nw=4, seed=14)

    def loss_kernel():
        def f(x_, wq_, rh_):
            return (wb.window_attention_block(
                x_, wq_, bqkv, wo, bo, rh_, rpw, win, heads) ** 2).sum()
        return jax.grad(f, argnums=(0, 1, 2))(xw, wqkv, rph)

    def loss_xla():
        def f(x_, wq_, rh_):
            return (wb._block_xla(
                x_, wq_, bqkv, wo, bo, rh_, rpw, win, heads) ** 2).sum()
        return jax.grad(f, argnums=(0, 1, 2))(xw, wqkv, rph)

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    wb.pl.pallas_call = interp
    try:
        g_k = loss_kernel()
    finally:
        wb.pl.pallas_call = orig
    g_ref = loss_xla()
    for a, b_ in zip(g_k, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_attention_module_block_impl_falls_back_off_tpu():
    """attn_impl='block' on CPU must match the xla path bit-for-bit (the
    fused kernel only engages on a TPU backend)."""
    from iuvl_tpu.models.sam.image_encoder import Attention

    rs = np.random.RandomState(15)
    x = jnp.asarray(rs.randn(2, 5, 5, 48).astype(np.float32))
    mod_x = Attention(dim=48, num_heads=3, input_size=(5, 5), attn_impl="xla")
    mod_b = Attention(dim=48, num_heads=3, input_size=(5, 5), attn_impl="block")
    params = mod_x.init(jax.random.PRNGKey(0), x)
    out_x = mod_x.apply(params, x)
    out_b = mod_b.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_x), atol=1e-6)


def _tail_inputs(t=48, c=32, hidden=128, seed=21, dtype=np.float32):
    rs = np.random.RandomState(seed)
    x = jnp.asarray((rs.randn(t, c) * 0.5).astype(dtype))
    a = jnp.asarray((rs.randn(t, c) * 0.5).astype(dtype))
    scale = jnp.asarray(1.0 + 0.1 * rs.randn(c).astype(np.float32))
    bias = jnp.asarray(0.1 * rs.randn(c).astype(np.float32))
    w1 = jnp.asarray((rs.randn(c, hidden) * 0.1).astype(np.float32))
    b1 = jnp.asarray((rs.randn(hidden) * 0.1).astype(np.float32))
    w2 = jnp.asarray((rs.randn(hidden, c) * 0.1).astype(np.float32))
    b2 = jnp.asarray((rs.randn(c) * 0.1).astype(np.float32))
    return x, a, scale, bias, w1, b1, w2, b2


def test_block_tail_kernel_interpret_matches_xla():
    """Fused residual+LN+MLP+residual tail kernel vs the flax-math XLA
    composition (interpret mode)."""
    from iuvl_tpu.ops.pallas import mlp_block as mb

    args = _tail_inputs()
    ref = mb._tail_xla(*args)

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    mb.pl.pallas_call = interp
    try:
        out = mb.block_tail(*args)
    finally:
        mb.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_block_tail_kernel_interpret_matches_xla_bf16():
    from iuvl_tpu.ops.pallas import mlp_block as mb

    args = _tail_inputs(seed=22)
    args = tuple(t.astype(jnp.bfloat16) if i < 2 else t
                 for i, t in enumerate(args))
    ref = mb._tail_xla(*args)

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    mb.pl.pallas_call = interp
    try:
        out = mb.block_tail(*args)
    finally:
        mb.pl.pallas_call = orig
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-2, rtol=1e-2)


def test_block_tail_grad_matches_xla():
    from iuvl_tpu.ops.pallas import mlp_block as mb

    x, a, scale, bias, w1, b1, w2, b2 = _tail_inputs(seed=23)

    def run(fn):
        def f(x_, a_, sc_, w1_):
            return (fn(x_, a_, sc_, bias, w1_, b1, w2, b2) ** 2).sum()
        return jax.grad(f, argnums=(0, 1, 2, 3))(x, a, scale, w1)

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a_, **kw):
        kw["interpret"] = True
        return orig(*a_, **kw)

    mb.pl.pallas_call = interp
    try:
        g_k = run(mb.block_tail)
    finally:
        mb.pl.pallas_call = orig
    g_ref = run(mb._tail_xla)
    for ga, gb in zip(g_k, g_ref):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-4)


def test_block_tail_odd_rows_falls_back():
    """Token counts not divisible by any row-chunk candidate fall back to
    the XLA tail inside the op (no pallas_call)."""
    from iuvl_tpu.ops.pallas import mlp_block as mb

    args = _tail_inputs(t=49, seed=24)
    out = mb.block_tail(*args)
    ref = mb._tail_xla(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_rowbias_flash_interpret_matches_naive():
    """Row-bias flash kernel (relw folded into the qk contraction, relh as
    in-kernel adds) vs the materialized oracle, with multiple q/k blocks
    so the per-block relh slicing is exercised."""
    from iuvl_tpu.ops.pallas import flash_attention as fa

    q, k, v, rph, rpw, hw = _inputs(h=4, w=4, heads=2, d=16, b=2, seed=31)
    ref = rel_pos_attention(q, k, v, rph, rpw, hw, impl="xla_naive")

    from iuvl_tpu.ops.rel_pos_attention import rel_pos_table
    h, w = hw
    b, heads, n, d = q.shape
    Rh = rel_pos_table(h, h, rph.astype(jnp.float32))
    Rw = rel_pos_table(w, w, rpw.astype(jnp.float32))
    r_q = q.astype(jnp.float32).reshape(b, heads, h, w, d)
    relh = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh).reshape(
        b, heads, n, h).astype(q.dtype)
    relw = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw).reshape(
        b, heads, n, w).astype(q.dtype)

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    fa.pl.pallas_call = interp
    try:
        out = fa.flash_attention_rowbias(
            q * (d ** -0.5), k, v, relh, relw, w, 8, 8)
    finally:
        fa.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_rowbias_flash_via_impl_matches_naive():
    """The impl='rowbias' route in rel_pos_attention (whole-array blocks
    for this size) vs the oracle."""
    from iuvl_tpu.ops.pallas import flash_attention as fa

    q, k, v, rph, rpw, hw = _inputs(h=6, w=5, heads=2, d=16, b=2, seed=32)
    ref = rel_pos_attention(q, k, v, rph, rpw, hw, impl="xla_naive")

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    fa.pl.pallas_call = interp
    try:
        out = rel_pos_attention(q, k, v, rph, rpw, hw, impl="rowbias")
    finally:
        fa.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_rowbias_flash_grad_matches_naive():
    """Fused row-bias backward (dq+drelw from one matmul, per-block drelh
    outputs, dk/dv) vs oracle grads incl. the rel-pos tables, with
    multiple q/k blocks."""
    from iuvl_tpu.ops.pallas import flash_attention as fa
    from iuvl_tpu.ops.rel_pos_attention import rel_pos_table

    q, k, v, rph, rpw, hw = _inputs(h=4, w=4, heads=2, d=16, b=2, seed=33)
    h, w = hw
    b, heads, n, d = q.shape

    def loss_rb(q_, k_, v_, rph_, rpw_):
        Rh = rel_pos_table(h, h, rph_.astype(jnp.float32))
        Rw = rel_pos_table(w, w, rpw_.astype(jnp.float32))
        r_q = q_.astype(jnp.float32).reshape(b, heads, h, w, d)
        relh = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh).reshape(
            b, heads, n, h).astype(q_.dtype)
        relw = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw).reshape(
            b, heads, n, w).astype(q_.dtype)
        return fa.flash_attention_rowbias(
            q_ * (d ** -0.5), k_, v_, relh, relw, w, 8, 8).sum()

    def loss_ref(q_, k_, v_, rph_, rpw_):
        return rel_pos_attention(
            q_, k_, v_, rph_, rpw_, hw, impl="xla_naive").sum()

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    fa.pl.pallas_call = interp
    try:
        g_p = jax.grad(loss_rb, argnums=(0, 1, 2, 3, 4))(q, k, v, rph, rpw)
    finally:
        fa.pl.pallas_call = orig
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, rph, rpw)
    for a, b_ in zip(g_p, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-4)


def test_gradswitch_primal_and_grad_match_oracle():
    """The auto-path grad-switching dispatch: the primal body (rowbias
    kernel) and the differentiated path (augmented flash via the
    custom_vjp fwd rule) must both match the materialized oracle."""
    import importlib

    from iuvl_tpu.ops.pallas import flash_attention as fa

    rpa_mod = importlib.import_module("iuvl_tpu.ops.rel_pos_attention")

    q, k, v, rph, rpw, hw = _inputs(h=4, w=4, heads=2, d=16, b=2, seed=34)
    ref = rel_pos_attention(q, k, v, rph, rpw, hw, impl="xla_naive")

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    fa.pl.pallas_call = interp
    try:
        out = rpa_mod._global_attention_gradswitch(q, k, v, rph, rpw, hw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

        def loss(q_, k_, v_, rh_, rw_):
            return rpa_mod._global_attention_gradswitch(
                q_, k_, v_, rh_, rw_, hw).sum()

        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k, v, rph, rpw)
    finally:
        fa.pl.pallas_call = orig

    def loss_ref(q_, k_, v_, rh_, rw_):
        return rel_pos_attention(q_, k_, v_, rh_, rw_, hw,
                                 impl="xla_naive").sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, rph, rpw)
    for a, b_ in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-4)


def test_rowbias_proj_kernel_interpret_matches_oracle():
    """Fused rowbias+projection kernel (interpret mode) vs the unfused
    attention -> relayout -> matmul composition, with multiple q/k blocks
    and multiple heads so the cross-head output accumulation and the
    per-head Wo slicing are exercised."""
    from iuvl_tpu.ops.pallas import flash_attention as fa
    from iuvl_tpu.ops.rel_pos_attention import (
        _attn_then_proj,
        rel_pos_table,
    )

    q, k, v, rph, rpw, hw = _inputs(h=4, w=4, heads=3, d=16, b=2, seed=41)
    h, w = hw
    b, heads, n, d = q.shape
    rs = np.random.RandomState(42)
    wo = jnp.asarray(rs.randn(heads * d, 24).astype(np.float32) * 0.1)
    bo = jnp.asarray(rs.randn(24).astype(np.float32) * 0.1)
    ref = _attn_then_proj(q, k, v, rph, rpw, wo, bo, hw, "xla_naive")

    Rh = rel_pos_table(h, h, rph.astype(jnp.float32))
    Rw = rel_pos_table(w, w, rpw.astype(jnp.float32))
    r_q = q.astype(jnp.float32).reshape(b, heads, h, w, d)
    relh = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh).reshape(
        b, heads, n, h).astype(q.dtype)
    relw = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw).reshape(
        b, heads, n, w).astype(q.dtype)

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    fa.pl.pallas_call = interp
    try:
        out = fa.flash_attention_rowbias_proj(
            q * (d ** -0.5), k, v, relh, relw, wo, bo, w, 8, 8)
    finally:
        fa.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_proj_gradswitch_primal_and_grad_match_oracle():
    """The proj-inclusive grad-switch: the primal body (fused
    rowbias+projection kernel) and the differentiated path (augmented
    flash + XLA projection via the custom_vjp fwd rule) must both match
    the unfused oracle, including wo/bo grads."""
    import importlib

    from iuvl_tpu.ops.pallas import flash_attention as fa

    rpa = importlib.import_module("iuvl_tpu.ops.rel_pos_attention")

    q, k, v, rph, rpw, hw = _inputs(h=4, w=4, heads=3, d=16, b=2, seed=43)
    heads, d = q.shape[1], q.shape[-1]
    rs = np.random.RandomState(44)
    wo = jnp.asarray(rs.randn(heads * d, 24).astype(np.float32) * 0.1)
    bo = jnp.asarray(rs.randn(24).astype(np.float32) * 0.1)
    ref = rpa._attn_then_proj(q, k, v, rph, rpw, wo, bo, hw, "xla_naive")

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    fa.pl.pallas_call = interp
    try:
        out = rpa._global_attention_proj_gradswitch(
            q, k, v, rph, rpw, wo, bo, hw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

        def loss(q_, k_, v_, rh_, rw_, wo_, bo_):
            return rpa._global_attention_proj_gradswitch(
                q_, k_, v_, rh_, rw_, wo_, bo_, hw).sum()

        g = jax.grad(loss, argnums=tuple(range(7)))(
            q, k, v, rph, rpw, wo, bo)
    finally:
        fa.pl.pallas_call = orig

    def loss_ref(q_, k_, v_, rh_, rw_, wo_, bo_):
        return rpa._attn_then_proj(
            q_, k_, v_, rh_, rw_, wo_, bo_, hw, "xla_naive").sum()

    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(
        q, k, v, rph, rpw, wo, bo)
    for a, b_ in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-4)


def test_rel_pos_attention_proj_matches_unfused_xla():
    """rel_pos_attention_proj with a plain impl must equal the previous
    module-level composition exactly (same ops, same order)."""
    from iuvl_tpu.ops.rel_pos_attention import (
        rel_pos_attention_proj,
    )

    q, k, v, rph, rpw, hw = _inputs(h=5, w=4, heads=2, d=16, b=1, seed=45)
    heads, d = q.shape[1], q.shape[-1]
    rs = np.random.RandomState(46)
    wo = jnp.asarray(rs.randn(heads * d, 32).astype(np.float32) * 0.1)
    bo = jnp.asarray(rs.randn(32).astype(np.float32) * 0.1)

    out = rel_pos_attention_proj(q, k, v, rph, rpw, wo, bo, hw, impl="xla")
    att = rel_pos_attention(q, k, v, rph, rpw, hw, impl="xla")
    b, h_, n_, d_ = att.shape
    ref = att.transpose(0, 2, 1, 3).reshape(b, n_, h_ * d_) @ wo + bo
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_block_tail_fused_bwd_all_args():
    """Round-4 fused Pallas backward: grads for ALL eight tail args match
    the XLA-vjp reference, fp32 and bf16 (interpret mode)."""
    from iuvl_tpu.ops.pallas import mlp_block as mb

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a_, **kw):
        kw["interpret"] = True
        return orig(*a_, **kw)

    # bf16 tolerance: the fused kernel accumulates weight grads in fp32
    # across row chunks while the XLA vjp rounds partial products through
    # bf16 — isolated small-magnitude elements can disagree by ~1 bf16 ulp
    # of the running sum.
    for dtype, atol in ((np.float32, 1e-4), (jnp.bfloat16, 2.5e-1)):
        args = _tail_inputs(seed=31)
        args = tuple(t.astype(dtype) if i < 2 else t
                     for i, t in enumerate(args))

        def run(fn):
            def f(*a_):
                return (fn(*a_).astype(jnp.float32) ** 2).sum()
            return jax.grad(f, argnums=tuple(range(8)))(*args)

        mb.pl.pallas_call = interp
        try:
            g_k = run(mb.block_tail)
        finally:
            mb.pl.pallas_call = orig
        g_ref = run(mb._tail_xla)
        for ga, gb in zip(g_k, g_ref):
            np.testing.assert_allclose(
                np.asarray(ga, np.float32), np.asarray(gb, np.float32),
                atol=atol, rtol=atol)


def test_window_block_fused_bwd_all_args():
    """Round-4 fused Pallas backward for the whole-attention window kernel:
    grads for ALL seven args match the XLA-vjp reference, fp32 and bf16."""
    from iuvl_tpu.ops.pallas import window_block as wb

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a_, **kw):
        kw["interpret"] = True
        return orig(*a_, **kw)

    win, heads = 4, 2
    for dtype, atol in ((np.float32, 2e-4), (jnp.bfloat16, 2.5e-1)):
        args = _block_inputs(win=win, heads=heads, nw=4, seed=41)
        args = tuple(t.astype(dtype) if i == 0 else t
                     for i, t in enumerate(args))

        def run(fn):
            def f(*a_):
                return (fn(*a_, win, heads).astype(jnp.float32) ** 2).sum()
            return jax.grad(f, argnums=tuple(range(7)))(*args)

        wb.pl.pallas_call = interp
        try:
            g_k = run(wb.window_attention_block)
        finally:
            wb.pl.pallas_call = orig
        g_ref = run(wb._block_xla)
        for ga, gb in zip(g_k, g_ref):
            np.testing.assert_allclose(
                np.asarray(ga, np.float32), np.asarray(gb, np.float32),
                atol=atol, rtol=atol)
