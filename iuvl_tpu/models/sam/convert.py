"""PyTorch SAM checkpoint -> flax params converter.

Maps the reference's state-dict naming (sam/modeling/*.py; checkpoints like
``sam_vit_b_01ec64.pth``) onto this package's NHWC flax parameter tree.
Pure numpy — torch is only needed to *load* a .pth (callers pass the
state_dict as a mapping of numpy arrays or torch tensors).

Layout conversions:
- Linear:          torch (out, in)            -> kernel (in, out)
- Conv2d:          torch (out, in, kh, kw)    -> kernel (kh, kw, in, out)
- ConvTranspose2d: torch (in, out, kh, kw)    -> kernel (kh, kw, out, in)
  (our modules use flax ConvTranspose(transpose_kernel=True), whose
  gradient-transpose semantics match torch's ConvTranspose2d.)
"""

from __future__ import annotations

from typing import Callable, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _linear(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _deconv(sd, prefix):
    # flax ConvTranspose(transpose_kernel=True) expects (kh, kw, out, in),
    # matching torch ConvTranspose2d's gradient-transpose semantics.
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _ln(sd, prefix):
    # flax LayerNorm/GroupNorm use 'scale'; our LayerNorm2d uses 'weight'.
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _ln2d(sd, prefix):
    return {"weight": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def convert_image_encoder(sd: Mapping, depth: int, prefix: str = "") -> dict:
    """Reference module: sam/modeling/image_encoder.py (ImageEncoderViT)."""
    g = lambda k: f"{prefix}{k}"
    p: dict = {
        "patch_embed": _conv(sd, g("patch_embed.proj")),
        "pos_embed": _np(sd[g("pos_embed")]),
        "neck_conv1": _conv(sd, g("orig_neck.0")),
        "neck_ln1": _ln2d(sd, g("orig_neck.1")),
        "neck_conv2": _conv(sd, g("orig_neck.2")),
        "neck_ln2": _ln2d(sd, g("orig_neck.3")),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        p[f"block{i}"] = {
            "norm1": _ln(sd, g(f"{b}.norm1")),
            "norm2": _ln(sd, g(f"{b}.norm2")),
            "attn": {
                "qkv": _linear(sd, g(f"{b}.attn.qkv")),
                "proj": _linear(sd, g(f"{b}.attn.proj")),
                "rel_pos_h": _np(sd[g(f"{b}.attn.rel_pos_h")]),
                "rel_pos_w": _np(sd[g(f"{b}.attn.rel_pos_w")]),
            },
            "mlp_lin1": _linear(sd, g(f"{b}.mlp.lin1")),
            "mlp_lin2": _linear(sd, g(f"{b}.mlp.lin2")),
        }
    # SimpleFPN (image_encoder.py:413-466): sequential indices -> named layers.
    fpn = {
        "down4_deconv1": _deconv(sd, g("neck.down_4.0")),
        "down4_gn1": _ln(sd, g("neck.down_4.1")),
        "down4_deconv2": _deconv(sd, g("neck.down_4.3")),
        "down4_gn2": _ln(sd, g("neck.down_4.4")),
        "down4_conv": _conv(sd, g("neck.down_4.5")),
        "down4_gn3": _ln(sd, g("neck.down_4.6")),
        "down8_deconv": _deconv(sd, g("neck.down_8.0")),
        "down8_gn1": _ln(sd, g("neck.down_8.1")),
        "down8_conv": _conv(sd, g("neck.down_8.2")),
        "down8_gn2": _ln(sd, g("neck.down_8.3")),
        "down16_conv": _conv(sd, g("neck.down_16.0")),
        "down16_gn": _ln(sd, g("neck.down_16.1")),
        "down32_conv1": _conv(sd, g("neck.down_32.0")),
        "down32_gn1": _ln(sd, g("neck.down_32.1")),
        "down32_conv2": _conv(sd, g("neck.down_32.2")),
        "down32_gn2": _ln(sd, g("neck.down_32.3")),
    }
    p["fpn"] = fpn
    return p


def convert_prompt_encoder(sd: Mapping, prefix: str = "") -> dict:
    """Reference module: sam/modeling/prompt_encoder.py."""
    g = lambda k: f"{prefix}{k}"
    return {
        "pe_layer": {
            "gaussian_matrix": _np(sd[g("pe_layer.positional_encoding_gaussian_matrix")])
        },
        "point_embeddings": np.concatenate(
            [_np(sd[g(f"point_embeddings.{i}.weight")]) for i in range(4)], axis=0
        ),
        "not_a_point_embed": _np(sd[g("not_a_point_embed.weight")]),
        "no_mask_embed": _np(sd[g("no_mask_embed.weight")]),
        "mask_conv1": _conv(sd, g("mask_downscaling.0")),
        "mask_ln1": _ln2d(sd, g("mask_downscaling.1")),
        "mask_conv2": _conv(sd, g("mask_downscaling.3")),
        "mask_ln2": _ln2d(sd, g("mask_downscaling.4")),
        "mask_conv3": _conv(sd, g("mask_downscaling.6")),
    }


def _attn_block(sd, prefix):
    return {
        "q_proj": _linear(sd, f"{prefix}.q_proj"),
        "k_proj": _linear(sd, f"{prefix}.k_proj"),
        "v_proj": _linear(sd, f"{prefix}.v_proj"),
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def _mlp(sd, prefix, n_layers):
    return {f"lin{i}": _linear(sd, f"{prefix}.layers.{i}") for i in range(n_layers)}


def convert_mask_decoder(sd: Mapping, prefix: str = "", depth: int = 2) -> dict:
    """Reference modules: sam/modeling/mask_decoder.py + transformer.py."""
    g = lambda k: f"{prefix}{k}"
    transformer: dict = {}
    for i in range(depth):
        t = g(f"transformer.layers.{i}")
        transformer[f"layer{i}"] = {
            "self_attn": _attn_block(sd, f"{t}.self_attn"),
            "norm1": _ln(sd, f"{t}.norm1"),
            "cross_attn_t2i": _attn_block(sd, f"{t}.cross_attn_token_to_image"),
            "norm2": _ln(sd, f"{t}.norm2"),
            "mlp_lin1": _linear(sd, f"{t}.mlp.lin1"),
            "mlp_lin2": _linear(sd, f"{t}.mlp.lin2"),
            "norm3": _ln(sd, f"{t}.norm3"),
            "cross_attn_i2t": _attn_block(sd, f"{t}.cross_attn_image_to_token"),
            "norm4": _ln(sd, f"{t}.norm4"),
        }
    transformer["final_attn_t2i"] = _attn_block(sd, g("transformer.final_attn_token_to_image"))
    transformer["norm_final_attn"] = _ln(sd, g("transformer.norm_final_attn"))

    p = {
        "iou_token": _np(sd[g("iou_token.weight")]),
        "mask_tokens": _np(sd[g("mask_tokens.weight")]),
        "transformer": transformer,
        "upscale_deconv1": _deconv(sd, g("output_upscaling.0")),
        "upscale_ln": _ln2d(sd, g("output_upscaling.1")),
        "upscale_deconv2": _deconv(sd, g("output_upscaling.3")),
        "iou_head": _mlp(sd, g("iou_prediction_head"), 3),
    }
    for i in range(4):
        p[f"hyper_mlp{i}"] = _mlp(sd, g(f"output_hypernetworks_mlps.{i}"), 3)
    return p


def convert_sam(state_dict: Mapping, depth: int = 12) -> dict:
    """Full reference SAM state dict -> {'params': ...} for models.sam.Sam."""
    return {
        "params": {
            "image_encoder": convert_image_encoder(
                state_dict, depth, prefix="image_encoder."
            ),
            "prompt_encoder": convert_prompt_encoder(
                state_dict, prefix="prompt_encoder."
            ),
            "mask_decoder": convert_mask_decoder(state_dict, prefix="mask_decoder."),
        }
    }


def load_sam_checkpoint(path: str, depth: int = 12) -> dict:
    """Load a .pth SAM checkpoint into flax params (host-side torch load)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_sam(sd, depth=depth)
