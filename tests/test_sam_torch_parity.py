"""Numerical parity of the flax SAM modules vs the PyTorch reference.

Strategy (SURVEY.md §4): instantiate the reference torch modules at tiny
sizes with random weights, convert the state dict with
iuvl_tpu.models.sam.convert, and compare forward outputs within float
tolerance. This is the BASELINE config-1 gate (per-mask IoU >= 0.99 vs
PyTorch) exercised at module granularity.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from iuvl_tpu.models.sam.convert import (  # noqa: E402
    convert_image_encoder,
    convert_mask_decoder,
    convert_prompt_encoder,
)

ATOL = 2e-4


@pytest.fixture(scope="module")
def torch_sam_modules():
    from functools import partial

    from sam.modeling.image_encoder import ImageEncoderViT as TorchEnc
    from sam.modeling.mask_decoder import MaskDecoder as TorchDec
    from sam.modeling.prompt_encoder import PromptEncoder as TorchPrompt
    from sam.modeling.transformer import TwoWayTransformer as TorchTwoWay

    torch.manual_seed(0)
    enc = TorchEnc(
        img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        out_chans=16, use_rel_pos=True, window_size=3, global_attn_indexes=(1,),
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()
    # Randomize zero-init tables so parity is non-trivial.
    with torch.no_grad():
        for blk in enc.blocks:
            blk.attn.rel_pos_h.normal_(std=0.1)
            blk.attn.rel_pos_w.normal_(std=0.1)
        enc.pos_embed.normal_(std=0.1)

    prompt = TorchPrompt(
        embed_dim=32, image_embedding_size=(4, 4), input_image_size=(64, 64),
        mask_in_chans=8,
    ).eval()

    dec = TorchDec(
        transformer_dim=32,
        transformer=TorchTwoWay(depth=2, embedding_dim=32, mlp_dim=64, num_heads=8),
        num_multimask_outputs=3,
    ).eval()
    return enc, prompt, dec


def test_image_encoder_parity(torch_sam_modules):
    enc, _, _ = torch_sam_modules
    from iuvl_tpu.models.sam.image_encoder import ImageEncoderViT

    x = np.random.RandomState(1).randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        h = enc.patch_embed(xt)
        h = h + enc.pos_embed
        for blk in enc.blocks:
            h = blk(h)
        fpn_t = {k: v.numpy().transpose(0, 2, 3, 1) for k, v in enc.neck(h.permute(0, 3, 1, 2)).items()}
        sam_emb_t = enc.orig_neck(h.permute(0, 3, 1, 2)).numpy().transpose(0, 2, 3, 1)

    jenc = ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        out_chans=16, window_size=3, global_attn_indexes=(1,),
    )
    params = {"params": convert_image_encoder(enc.state_dict(), depth=2)}
    sam_emb_j, fpn_j = jenc.apply(params, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(sam_emb_j), sam_emb_t, atol=ATOL)
    for k in ("res2", "res3", "res4", "res5"):
        np.testing.assert_allclose(
            np.asarray(fpn_j[k]), fpn_t[k], atol=ATOL, err_msg=k
        )


def test_prompt_encoder_parity(torch_sam_modules):
    _, prompt, _ = torch_sam_modules
    from iuvl_tpu.models.sam.prompt_encoder import PromptEncoder

    pts = np.array([[[10.0, 20.0], [40.0, 50.0]]], dtype=np.float32)
    labs = np.array([[1, 0]], dtype=np.int32)
    with torch.no_grad():
        sparse_t, dense_t = prompt(
            points=(torch.from_numpy(pts), torch.from_numpy(labs)),
            boxes=None,
            masks=None,
        )
    jprompt = PromptEncoder(
        embed_dim=32, image_embedding_size=(4, 4), input_image_size=(64, 64),
        mask_in_chans=8,
    )
    params = {"params": convert_prompt_encoder(prompt.state_dict())}
    sparse_j, dense_j = jprompt.apply(params, jnp.asarray(pts), jnp.asarray(labs))
    np.testing.assert_allclose(np.asarray(sparse_j), sparse_t.detach().numpy(), atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(dense_j), dense_t.detach().numpy().transpose(0, 2, 3, 1), atol=ATOL
    )

    # Box + mask prompts.
    boxes = np.array([[8.0, 8.0, 48.0, 40.0]], dtype=np.float32)
    mask_in = np.random.RandomState(3).randn(1, 1, 16, 16).astype(np.float32)
    with torch.no_grad():
        sparse_t2, dense_t2 = prompt(
            points=None, boxes=torch.from_numpy(boxes), masks=torch.from_numpy(mask_in)
        )
    sparse_j2, dense_j2 = jprompt.apply(
        params, boxes=jnp.asarray(boxes), masks=jnp.asarray(mask_in.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(sparse_j2), sparse_t2.detach().numpy(), atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(dense_j2), dense_t2.detach().numpy().transpose(0, 2, 3, 1), atol=ATOL
    )


def test_mask_decoder_parity(torch_sam_modules):
    _, prompt, dec = torch_sam_modules
    from iuvl_tpu.models.sam.mask_decoder import MaskDecoder

    rs = np.random.RandomState(2)
    emb = rs.randn(1, 4, 4, 32).astype(np.float32)
    pe = rs.randn(1, 4, 4, 32).astype(np.float32)
    sparse = rs.randn(1, 3, 32).astype(np.float32)
    dense = rs.randn(1, 4, 4, 32).astype(np.float32)

    with torch.no_grad():
        upscaled_t, hyper_t = dec.predict_masks(
            image_embeddings=torch.from_numpy(emb.transpose(0, 3, 1, 2)),
            image_pe=torch.from_numpy(pe.transpose(0, 3, 1, 2)),
            sparse_prompt_embeddings=torch.from_numpy(sparse),
            dense_prompt_embeddings=torch.from_numpy(dense.transpose(0, 3, 1, 2)),
        )

    jdec = MaskDecoder(transformer_dim=32, transformer_mlp_dim=64)
    params = {"params": convert_mask_decoder(dec.state_dict())}
    out = jdec.apply(
        params,
        jnp.asarray(emb),
        jnp.asarray(pe[0]),
        jnp.asarray(sparse),
        jnp.asarray(dense),
    )

    np.testing.assert_allclose(
        np.asarray(out["upscaled_embedding"]),
        upscaled_t.detach().numpy().transpose(0, 2, 3, 1),
        atol=ATOL,
    )
    np.testing.assert_allclose(np.asarray(out["hyper_in"]), hyper_t.detach().numpy(), atol=ATOL)
