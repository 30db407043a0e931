"""KV-cached captioning decode ≡ the full re-run decoder (VERDICT r2 #4).

The cached path exploits that query rows never attend to caption rows
(unified_decoder.build_base_self_mask), so per-layer query K/V freeze after
one prefill; caption rows are causal. Exact-arithmetic equivalence means
the greedy token ids must match the full re-run implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_cached_captioning_matches_full_rerun():
    from tests.test_syslearner import _tiny_model
    from iuvl_tpu.models.xdecoder.model import SysLearner

    model = _tiny_model(vocab_size=49408)
    images0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    text_emb = jnp.ones((5, 32), jnp.float32)
    params = jax.jit(
        lambda r: model.init(r, images0, text_emb, method=SysLearner.warmup)
    )(jax.random.PRNGKey(0))

    img = jnp.asarray(
        np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32) * 255
    )
    full = jax.jit(lambda p, i: model.apply(
        p, i, steps=6, method=SysLearner.evaluate_captioning))
    cached = jax.jit(lambda p, i: model.apply(
        p, i, steps=6, method=SysLearner.evaluate_captioning_cached))
    ids_full = np.asarray(full(params, img))
    ids_cached = np.asarray(cached(params, img))
    assert ids_full.shape == ids_cached.shape
    np.testing.assert_array_equal(ids_full, ids_cached)


def test_caption_step_row_matches_full_layer_row():
    """Layer-level check: one caption row via caption_step equals its row in
    the full [queries; captions] self-attention pass."""
    from iuvl_tpu.models.xdecoder.unified_decoder import (
        NEG_INF, DecoderLayer, build_base_self_mask,
    )

    rs = np.random.RandomState(3)
    b, nq, L, c, hw = 2, 5, 4, 16, 12
    layer = DecoderLayer(d_model=c, nhead=4, dim_feedforward=32)
    tgt_q = jnp.asarray(rs.randn(b, nq, c), jnp.float32)
    caps = jnp.asarray(rs.randn(b, L, c), jnp.float32)
    qpos = jnp.asarray(rs.randn(b, nq, c), jnp.float32)
    cpos = jnp.asarray(rs.randn(b, L, c), jnp.float32)
    mem = jnp.asarray(rs.randn(b, hw, c), jnp.float32)
    mpos = jnp.asarray(rs.randn(b, hw, c), jnp.float32)

    params = layer.init(
        jax.random.PRNGKey(0), tgt_q, mem, qpos, mpos, None, None
    )

    mask = build_base_self_mask(nq, L)
    self_bias = jnp.where(jnp.asarray(mask), NEG_INF, 0.0)[None, None]
    tgt_all = jnp.concatenate([tgt_q, caps], axis=1)
    pos_all = jnp.concatenate([qpos, cpos], axis=1)
    full_out, _ = layer.apply(
        params, tgt_all, mem, pos_all, mpos, None, self_bias
    )

    # cached path: freeze query K/V from a query-only pass, then push each
    # caption row. NOTE the query-only pass must use the same cross-attn
    # inputs, so the frozen q_kv equals the full run's query rows.
    q_bias = jnp.where(jnp.asarray(mask[:nq, :nq]), NEG_INF, 0.0)[None, None]
    _, (q_k, q_v) = layer.apply(
        params, tgt_q, mem, qpos, mpos, None, q_bias, collect_kv=True
    )
    cap_k = jnp.zeros((b, L, c), jnp.float32)
    cap_v = jnp.zeros((b, L, c), jnp.float32)
    rows = []
    for t in range(L):
        e, cap_k, cap_v = layer.apply(
            params, caps[:, t : t + 1], cpos[:, t : t + 1], mem, mpos,
            q_k, q_v, cap_k, cap_v, t, method=DecoderLayer.caption_step,
        )
        rows.append(e)
    cached_rows = jnp.concatenate(rows, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_out[:, nq:]), np.asarray(cached_rows),
        rtol=2e-5, atol=2e-5,
    )


def test_text_tower_step_matches_full_forward():
    """Round-4: the CLIP text tower's KV-cached decode_step reproduces the
    full causal forward row-by-row (lang_encoder.ResidualAttentionBlock.step
    vs __call__ under the triu mask)."""
    from iuvl_tpu.models.xdecoder.lang_encoder import TextTransformer

    rs = np.random.RandomState(0)
    tower = TextTransformer(
        context_length=9, vocab_size=50, width=32, layers=3, heads=4
    )
    ids = jnp.asarray(rs.randint(0, 50, (2, 9)), jnp.int32)
    params = tower.init(jax.random.PRNGKey(0), ids)
    full = tower.apply(params, ids)  # (2, 9, 32)

    caches = tower.apply(params, 2, method=TextTransformer.init_cache)
    rows = []
    for t in range(9):
        row, caches = tower.apply(
            params, ids[:, t], t, caches, method=TextTransformer.decode_step
        )
        rows.append(row[:, 0])
    inc = jnp.stack(rows, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc),
                               rtol=1e-5, atol=1e-5)
