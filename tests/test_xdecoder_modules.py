import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iuvl_tpu.models.xdecoder.lang_encoder import LanguageEncoder
from iuvl_tpu.models.xdecoder.pixel_decoder import DeformablePixelDecoder
from iuvl_tpu.models.xdecoder.unified_decoder import UnifiedDecoder

B, C = 1, 32


@pytest.fixture(scope="module")
def fpn_features():
    rs = np.random.RandomState(0)
    return {
        "res2": jnp.asarray(rs.randn(B, 16, 16, 8).astype(np.float32)),
        "res3": jnp.asarray(rs.randn(B, 8, 8, 8).astype(np.float32)),
        "res4": jnp.asarray(rs.randn(B, 4, 4, 8).astype(np.float32)),
        "res5": jnp.asarray(rs.randn(B, 2, 2, 8).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def pixel_decoder_out(fpn_features):
    pd = DeformablePixelDecoder(conv_dim=C, mask_dim=C, num_layers=2, n_heads=4)
    params = pd.init(jax.random.PRNGKey(0), fpn_features)
    mask_feat, ms = pd.apply(params, fpn_features)
    return mask_feat, ms


def test_pixel_decoder_shapes(pixel_decoder_out):
    mask_feat, ms = pixel_decoder_out
    assert mask_feat.shape == (B, 16, 16, C)
    assert [m.shape for m in ms] == [(B, 2, 2, C), (B, 4, 4, C), (B, 8, 8, C)]
    assert np.isfinite(np.asarray(mask_feat)).all()


def _decoder(**kw):
    return UnifiedDecoder(
        hidden_dim=C, dim_proj=C, num_queries=11, contxt_len=7, nheads=4,
        dim_feedforward=64, mask_dim=C, **kw,
    )


def test_unified_decoder_seg(pixel_decoder_out):
    mask_feat, ms = pixel_decoder_out
    dec = _decoder()
    text_emb = jnp.asarray(np.random.RandomState(1).randn(5, C).astype(np.float32))
    params = dec.init(
        jax.random.PRNGKey(1), ms, mask_feat, text_embeddings=text_emb, task="seg"
    )
    out = dec.apply(params, ms, mask_feat, text_embeddings=text_emb, task="seg")
    assert out["pred_logits"].shape == (B, 11, 5)
    assert out["pred_masks"].shape == (B, 11, 16, 16)
    assert len(out["aux_outputs"]) == 9
    assert np.isfinite(np.asarray(out["pred_masks"])).all()


def test_unified_decoder_grounding(pixel_decoder_out):
    mask_feat, ms = pixel_decoder_out
    dec = _decoder()
    G = 4
    gtok = jnp.asarray(np.random.RandomState(2).randn(B, G, C).astype(np.float32))
    gvalid = jnp.asarray(np.array([[True, True, False, False]]))
    params = dec.init(
        jax.random.PRNGKey(2), ms, mask_feat, task="grounding_eval",
        grounding_tokens=gtok, grounding_valid=gvalid,
    )
    out = dec.apply(
        params, ms, mask_feat, task="grounding_eval",
        grounding_tokens=gtok, grounding_valid=gvalid,
    )
    # 11 base queries + 10 grounding slots.
    assert out["pred_masks"].shape == (B, 21, 16, 16)
    assert np.isfinite(np.asarray(out["pred_masks"])).all()


def test_unified_decoder_vlp_and_llm(pixel_decoder_out):
    mask_feat, ms = pixel_decoder_out
    dec = _decoder()
    ctx = jnp.asarray(np.random.RandomState(3).randn(B, 7, C).astype(np.float32))
    params = dec.init(
        jax.random.PRNGKey(3), ms, mask_feat, task="vlp", caption_tokens=ctx
    )
    out = dec.apply(params, ms, mask_feat, task="vlp", caption_tokens=ctx)
    assert out["pred_captionings"].shape == (B, 7, C)

    out2 = dec.apply(params, ms, mask_feat, task="vqa", caption_tokens=ctx)
    assert out2["image_feature"].shape == (B, 10, C)


def test_language_encoder():
    enc = LanguageEncoder(width=C, proj_dim=C, layers=2, heads=4, context_length=7,
                          vocab_size=100)
    ids = jnp.asarray(np.array([[1, 5, 7, 99, 0, 0, 0]]))
    params = enc.init(jax.random.PRNGKey(0), ids)
    emb = enc.apply(params, ids)
    assert emb.shape == (1, C)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)

    tok, cls = enc.apply(params, ids, method=LanguageEncoder.forward_language_token)
    assert tok.shape == (1, 7, C) and cls.shape == (1, C)

    sim = enc.apply(
        params, jnp.ones((1, 3, C)), jnp.ones((4, C)),
        method=LanguageEncoder.compute_similarity,
    )
    assert sim.shape == (1, 3, 4)
