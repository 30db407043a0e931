"""Unified-decoder torch oracle parity (seg path).

An independent PyTorch reimplementation of the REFERENCE decoder semantics
(/root/reference/modeling/interface/xdecoder.py: CrossAttentionLayer /
SelfAttentionLayer / FFNLayer post-norm order, DETR sine PE + level embed,
block self-attention mask with obj/cls isolation, mask-attention bias with
the all-masked-row unmask quirk, class-token recompute, similarity class
head, mask_embed x mask_features head) — built from torch.nn primitives,
loaded with the flax module's weights, and compared output-for-output.

All three feature levels use the SAME spatial size as mask_features so the
mask-attention resize is an exact identity in both frameworks (bicubic
interpolation differs between torch and jax.image; at identity it doesn't).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from iuvl_tpu.models.xdecoder.unified_decoder import UnifiedDecoder

B, HID, NQ, HEADS, FF, MASKD, K = 2, 64, 11, 4, 128, 64, 5
HW = (8, 8)


def sine_pe_torch(h, w, num_pos_feats):
    """Reference modules/position_encoding.py with normalize=True."""
    scale = 2 * math.pi
    eps = 1e-6
    y_embed = torch.arange(1, h + 1, dtype=torch.float32)[:, None].expand(h, w)
    x_embed = torch.arange(1, w + 1, dtype=torch.float32)[None, :].expand(h, w)
    y_embed = y_embed / (h + eps) * scale
    x_embed = x_embed / (w + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=-1).flatten(2)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=-1).flatten(2)
    return torch.cat([pos_y, pos_x], dim=-1)  # (h, w, 2F)


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def mha(params, q, k, v, bias):
    """torch F.multi_head_attention_forward with flax Dense weights."""
    c = q.shape[-1]
    in_w = torch.cat([t(params["q_proj"]["kernel"]).T,
                      t(params["k_proj"]["kernel"]).T,
                      t(params["v_proj"]["kernel"]).T], dim=0)
    in_b = torch.cat([t(params["q_proj"]["bias"]),
                      t(params["k_proj"]["bias"]),
                      t(params["v_proj"]["bias"])], dim=0)
    out_w = t(params["out_proj"]["kernel"]).T
    out_b = t(params["out_proj"]["bias"])
    # batch-first -> (L, B, C)
    qt, kt, vt = (x.transpose(0, 1) for x in (q, k, v))
    attn_mask = None
    if bias is not None:
        # (B, 1, L, S) additive -> (B*heads, L, S)
        attn_mask = bias.expand(-1, HEADS, -1, -1).reshape(-1, bias.shape[2], bias.shape[3])
    out, _ = F.multi_head_attention_forward(
        qt, kt, vt, c, HEADS, in_w, in_b, None, None, False, 0.0,
        out_w, out_b, training=False, need_weights=False, attn_mask=attn_mask,
    )
    return out.transpose(0, 1)


def layer_norm(p, x, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), t(p["scale"]), t(p["bias"]), eps)


def heads_torch(p, output, mask_features, text_emb):
    dec = layer_norm(p["decoder_norm"], output)
    norm_dec = dec / (dec.norm(dim=-1, keepdim=True) + 1e-7)
    obj, cls = norm_dec[:, : NQ - 1], norm_dec[:, NQ - 1 : NQ]
    sim = torch.softmax(torch.einsum("bic,bqc->bqi", obj, cls), dim=-1)[:, 0, :, None]
    cls_token = (sim * dec[:, : NQ - 1]).sum(dim=1, keepdim=True)
    dec = torch.cat([dec[:, : NQ - 1], cls_token], dim=1)

    class_embed = dec @ t(p["class_embed"])
    v = class_embed / (class_embed.norm(dim=-1, keepdim=True) + 1e-7)
    outputs_class = torch.einsum("bqd,kd->bqk", v, text_emb)

    y = dec
    for i in range(3):
        y = y @ t(p["mask_embed"][f"lin{i}"]["kernel"]) + t(p["mask_embed"][f"lin{i}"]["bias"])
        if i < 2:
            y = torch.relu(y)
    outputs_mask = torch.einsum("bqc,bhwc->bqhw", y, mask_features)
    return outputs_class, outputs_mask


def bias_from_mask(outputs_mask):
    """Identity-size mask-attention quirk chain (reference :463-471, :266)."""
    b, q = outputs_mask.shape[:2]
    disallow = (torch.sigmoid(outputs_mask) < 0.5).reshape(b, q, -1)
    all_masked = disallow.all(dim=-1, keepdim=True)
    disallow = torch.where(all_masked, torch.zeros_like(disallow), disallow)
    return torch.where(disallow, torch.full_like(disallow, -1e9, dtype=torch.float32),
                       torch.zeros(b, q, disallow.shape[-1]))[:, None]


@pytest.mark.parametrize("seed", [0])
def test_unified_decoder_seg_matches_torch_oracle(seed):
    rng = jax.random.PRNGKey(seed)
    dec = UnifiedDecoder(
        hidden_dim=HID, dim_proj=HID, num_queries=NQ, contxt_len=16,
        nheads=HEADS, dim_feedforward=FF, mask_dim=MASKD,
        num_feature_levels=3, num_rounds=3,
    )
    h, w = HW
    multi_scale = [
        jax.random.normal(jax.random.fold_in(rng, i), (B, h, w, HID)) * 0.5
        for i in range(3)
    ]
    mask_features = jax.random.normal(jax.random.fold_in(rng, 9), (B, h, w, MASKD)) * 0.5
    text = jax.random.normal(jax.random.fold_in(rng, 10), (K, HID))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)

    params = dec.init(jax.random.PRNGKey(1), multi_scale, mask_features, text, task="seg")
    out = dec.apply(params, multi_scale, mask_features, text, task="seg")

    # ---- torch oracle ---- #
    p = jax.tree.map(np.asarray, params["params"])
    text_t = t(np.asarray(text))
    mf_t = t(np.asarray(mask_features))

    pe = sine_pe_torch(h, w, HID // 2).reshape(1, h * w, HID)
    srcs = [
        t(np.asarray(m)).reshape(B, h * w, HID) + t(p["level_embed"][i])[None, None]
        for i, m in enumerate(multi_scale)
    ]

    output = t(p["query_feat"])[None].expand(B, -1, -1).contiguous()
    query_pos = t(p["query_embed"])[None].expand(B, -1, -1).contiguous()

    base = np.zeros((NQ, NQ), bool)
    base[: NQ - 1, NQ - 1:] = True
    base[NQ - 1:, : NQ - 1] = True
    self_bias = torch.where(
        torch.from_numpy(base), torch.tensor(-1e9), torch.tensor(0.0)
    )[None, None].expand(B, 1, NQ, NQ)

    with torch.no_grad():
        ocls, omask = heads_torch(p, output, mf_t, text_t)
        for i in range(9):
            lp = p[f"layer{i}"]
            cross_bias = bias_from_mask(omask)
            y = mha(lp["cross_attn"], output + query_pos,
                    srcs[i % 3] + pe, srcs[i % 3], cross_bias)
            output = layer_norm(lp["cross_norm"], output + y)
            q = output + query_pos
            y = mha(lp["self_attn"], q, q, output, self_bias)
            output = layer_norm(lp["self_norm"], output + y)
            y = output @ t(lp["ffn_lin1"]["kernel"]) + t(lp["ffn_lin1"]["bias"])
            y = torch.relu(y) @ t(lp["ffn_lin2"]["kernel"]) + t(lp["ffn_lin2"]["bias"])
            output = layer_norm(lp["ffn_norm"], output + y)
            ocls, omask = heads_torch(p, output, mf_t, text_t)

    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), ocls.numpy(), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"]), omask.numpy(), atol=5e-3, rtol=1e-3
    )
