import jax
import jax.numpy as jnp
import pytest

from iuvl_tpu.models.sam import SamConfig, build_sam
from iuvl_tpu.models.sam.build import Sam

# Tiny config: 128px image, 8x8 token grid, window 3 (pads to 9x9).
TINY = SamConfig(
    embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,),
    img_size=128, window_size=3,
)


@pytest.fixture(scope="module")
def sam_and_params():
    model = Sam(cfg=TINY)
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    points = jnp.array([[[40.0, 50.0]]])
    labels = jnp.array([[1]])
    # Init must trace every prompt branch so all params are created.
    boxes = jnp.array([[8.0, 8.0, 100.0, 100.0]])
    masks = jnp.zeros((1, 32, 32, 1), jnp.float32)
    params = model.init(rng, images, points, labels, boxes, masks)
    return model, params


def test_encoder_shapes(sam_and_params):
    model, params = sam_and_params
    images = jnp.ones((2, 128, 128, 3), jnp.float32)
    emb, fpn = model.apply(
        params, model.normalize(images) * 0 + images, method=Sam.encode_image
    )
    grid = 128 // 16
    assert emb.shape == (2, grid, grid, 256)
    assert fpn["res2"].shape == (2, grid * 4, grid * 4, 128)
    assert fpn["res3"].shape == (2, grid * 2, grid * 2, 256)
    assert fpn["res4"].shape == (2, grid, grid, 512)
    assert fpn["res5"].shape == (2, grid // 2, grid // 2, 1024)


def test_full_pipeline_outputs(sam_and_params):
    model, params = sam_and_params
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3)) * 255
    points = jnp.array([[[40.0, 50.0], [80.0, 30.0]]])
    labels = jnp.array([[1, 0]])
    out = model.apply(params, images, points, labels)
    grid = 128 // 16
    assert out["masks"].shape == (1, 4, grid * 4, grid * 4)
    assert out["iou_pred"].shape == (1, 4)
    assert out["upscaled_embedding"].shape == (1, grid * 4, grid * 4, 32)
    assert out["hyper_in"].shape == (1, 4, 32)
    assert jnp.isfinite(out["masks"]).all()


def test_box_and_mask_prompts(sam_and_params):
    model, params = sam_and_params
    images = jnp.ones((1, 128, 128, 3), jnp.float32)
    boxes = jnp.array([[10.0, 10.0, 100.0, 90.0]])
    grid = 128 // 16
    mask_prompt = jnp.zeros((1, grid * 4, grid * 4, 1), jnp.float32)
    out = model.apply(params, images, boxes=boxes, masks=mask_prompt)
    assert out["masks"].shape == (1, 4, grid * 4, grid * 4)


def test_jit_encode(sam_and_params):
    model, params = sam_and_params
    fn = jax.jit(lambda p, x: model.apply(p, x, method=Sam.encode_image))
    emb, fpn = fn(params, jnp.ones((1, 128, 128, 3), jnp.float32))
    assert emb.shape[0] == 1


def test_blockdiag_packing_matches_reference_path():
    """DownsampledAttention's block-diagonal head packing (the bf16 serving
    fast path) must match the head-split einsum path; forced on in fp32
    here so the comparison isolates the formulation, not the dtype."""
    from iuvl_tpu.models.sam.mask_decoder import DownsampledAttention

    rng = jax.random.PRNGKey(0)
    cases = [
        # (nq, nk, batch_q, batch_kv): t2i / i2t, with batch-1 broadcasts
        (7, 4096 // 16, 5, 5),
        (7, 4096 // 16, 5, 1),     # block0 t2i: keys batch-1
        (4096 // 16, 7, 5, 5),
        (4096 // 16, 7, 1, 5),     # block0 i2t: keys batch-1
        (12, 4096 // 16, 5, 5),    # more tokens (interactive clicks)
    ]
    for nq, nk, bq, bkv in cases:
        kq, kk, kpe = jax.random.split(jax.random.fold_in(rng, nq * nk), 3)
        q = jax.random.normal(kq, (bq, nq, 256), jnp.float32)
        kv = jax.random.normal(kk, (bkv, nk, 256), jnp.float32)
        q_pe = jax.random.normal(kpe, (bq, nq, 256), jnp.float32)
        k_pe = jax.random.normal(jax.random.fold_in(kpe, 1), (bkv, nk, 256))

        ref = DownsampledAttention(256, 8, 2, packing="off")
        fast = DownsampledAttention(256, 8, 2, packing="on")
        params = ref.init(jax.random.PRNGKey(1), q, kv, kv)
        a = ref.apply(params, q, kv, kv, q_pe=q_pe, k_pe=k_pe)
        b = fast.apply(params, q, kv, kv, q_pe=q_pe, k_pe=k_pe)
        assert a.shape == b.shape
        err = jnp.abs(a - b).max()
        assert err < 1e-4, (nq, nk, bq, bkv, float(err))
