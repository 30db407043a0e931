"""Whole-chunk fused SAM decode (ops/pallas/decode_chunk.py).

Parity ladder, one shared param tree throughout:
  unfused module path  ==  batched XLA oracle (decode_tail_xla, "chunk_xla")
                       ==  Pallas kernel in interpret mode ("chunk")
plus grads of the chunk path vs the unfused path (the custom VJP recomputes
through the oracle).
"""

import jax
import jax.numpy as jnp
import numpy as np

from iuvl_tpu.models.sam.mask_decoder import MaskDecoder

OUT_KEYS = ("masks", "iou_pred", "upscaled_embedding", "hyper_in")


def _setup(b=3, grid=8, c=256, t=2, seed=0):
    rng = jax.random.PRNGKey(seed)
    emb = jax.random.normal(rng, (1, grid, grid, c), jnp.float32) * 0.5
    pe = jax.random.normal(jax.random.fold_in(rng, 1), (grid, grid, c)) * 0.5
    sparse = jax.random.normal(jax.random.fold_in(rng, 2), (b, t, c)) * 0.5
    dense = jax.random.normal(
        jax.random.fold_in(rng, 3), (1, grid, grid, c)) * 0.1
    slow = MaskDecoder(twoway_impl="off")
    params = slow.init(jax.random.PRNGKey(1), emb, pe, sparse, dense)
    return slow, params, (emb, pe, sparse, dense)


def test_chunk_xla_matches_unfused():
    slow, params, args = _setup()
    ref = slow.apply(params, *args)
    out = MaskDecoder(twoway_impl="chunk_xla").apply(params, *args)
    for k in OUT_KEYS:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=3e-4, rtol=1e-4, err_msg=k)


def test_chunk_kernel_interpret_matches_oracle():
    import jax.experimental.pallas as pl
    from iuvl_tpu.ops.pallas import decode_chunk as dc

    _, params, args = _setup(seed=5)
    ref = MaskDecoder(twoway_impl="chunk_xla").apply(params, *args)

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    dc.pl.pallas_call = interp
    try:
        out = MaskDecoder(twoway_impl="chunk").apply(params, *args)
    finally:
        dc.pl.pallas_call = orig
    for k in OUT_KEYS:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=2e-4, rtol=1e-4, err_msg=k)


def test_chunk_grad_matches_unfused():
    slow, params, args = _setup(b=2, seed=9)

    def loss(mod):
        def f(p, emb):
            o = mod.apply(p, emb, *args[1:])
            return ((o["masks"].astype(jnp.float32) ** 2).mean()
                    + (o["iou_pred"].astype(jnp.float32) ** 2).mean())
        return f

    g_ref = jax.grad(loss(slow), argnums=(0, 1))(params, args[0])
    g_chunk = jax.grad(
        loss(MaskDecoder(twoway_impl="chunk_xla")), argnums=(0, 1)
    )(params, args[0])
    flat_r, _ = jax.tree.flatten(g_ref)
    flat_c, _ = jax.tree.flatten(g_chunk)
    assert len(flat_r) == len(flat_c)
    for a, b_ in zip(flat_r, flat_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-3, rtol=1e-3)
