import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iuvl_tpu.inference.postprocess import (
    instance_inference,
    panoptic_merge,
    semantic_inference,
)
from iuvl_tpu.models.xdecoder.model import SysLearner, SysLearnerConfig

# Tiny end-to-end config: 64px image -> 4x4 SAM grid.
TINY = SysLearnerConfig(
    sam_size="base", img_size=64, syslearner_dim=32, mask_proposals=10,
    contxt_len=7, text_width=32, text_layers=2, text_heads=4, vocab_size=64,
    pixel_decoder_layers=2, nheads=4, dim_feedforward=64,
)


def _tiny_model(**overrides):
    # Shrink the SAM trunk via a patched variant table entry.
    import iuvl_tpu.models.sam.build as sb

    sb.SAM_VARIANTS["tiny_test"] = dict(
        embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,)
    )
    cfg = SysLearnerConfig(
        **{**TINY.__dict__, "sam_size": "tiny_test", **overrides}
    )
    return SysLearner(cfg=cfg)


@pytest.fixture(scope="module")
def model_and_params():
    model = _tiny_model()
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    text_emb = jnp.ones((5, 32), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), images, text_emb, method=SysLearner.warmup
    )
    return model, params


def test_evaluate_seg(model_and_params):
    model, params = model_and_params
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32) * 255
    )
    text_emb = jnp.asarray(np.random.RandomState(1).randn(5, 32).astype(np.float32))
    mask_cls, mask_pred = model.apply(
        params, images, text_emb, method=SysLearner.evaluate_seg
    )
    assert mask_cls.shape == (1, 11, 5)
    assert mask_pred.shape == (1, 11, 64, 64)

    sem = semantic_inference(mask_cls[0], mask_pred[0])
    assert sem.shape == (4, 64, 64)

    inst = instance_inference(mask_cls[0], mask_pred[0], topk=7)
    assert inst["pred_masks"].shape == (7, 64, 64)
    assert inst["scores"].shape == (7,)

    pan, segs = panoptic_merge(
        np.asarray(mask_cls[0]), np.asarray(mask_pred[0]), thing_ids={0, 1},
        object_mask_threshold=0.0,
    )
    assert pan.shape == (64, 64)


def test_forward_seg_with_grounding(model_and_params):
    model, params = model_and_params
    images = jnp.ones((1, 64, 64, 3), jnp.float32)
    text_emb = jnp.ones((5, 32), jnp.float32)
    gtok = jnp.asarray(np.random.RandomState(2).randn(1, 3, 32).astype(np.float32))
    gvalid = jnp.asarray([[True, True, False]])
    out = model.apply(
        params, images, text_emb, grounding_tokens=gtok, grounding_valid=gvalid,
        method=SysLearner.forward_seg,
    )
    # 11 queries + 10 grounding slots
    assert out["pred_masks"].shape[1] == 21
    assert len(out["aux_outputs"]) == 9


def test_interactive_decode(model_and_params):
    model, params = model_and_params
    images = jnp.ones((1, 64, 64, 3), jnp.float32)
    sam_emb, fpn = model.apply(params, images, method=SysLearner.encode_image)
    assert sam_emb.shape == (1, 4, 4, 256)
    pts = jnp.asarray([[[30.0, 30.0]]])
    labs = jnp.asarray([[1]])
    out = model.apply(
        params, sam_emb, points=pts, labels=labs, method=SysLearner.decode_prompts
    )
    assert out["masks"].shape == (1, 4, 16, 16)
    assert out["upscaled_embedding"].shape == (1, 16, 16, 32)


def test_evaluate_grounding(model_and_params):
    model, params = model_and_params
    images = jnp.ones((1, 64, 64, 3), jnp.float32)
    gtok = jnp.asarray(np.random.RandomState(3).randn(1, 4, 32).astype(np.float32))
    gvalid = jnp.ones((1, 4), bool)
    class_emb = jnp.asarray(np.random.RandomState(4).randn(1, 2, 32).astype(np.float32))
    masks = model.apply(
        params, images, gtok, gvalid, class_emb,
        method=SysLearner.evaluate_grounding,
    )
    assert masks.shape == (1, 2, 64, 64)


def test_evaluate_captioning(model_and_params):
    model, params = model_and_params
    images = jnp.ones((1, 64, 64, 3), jnp.float32)
    ids = model.apply(
        params, images, steps=3, sot_id=5, method=SysLearner.evaluate_captioning
    )
    assert ids.shape == (1, 7)
    assert int(ids[0, 0]) == 5
    assert (np.asarray(ids) >= 0).all()
