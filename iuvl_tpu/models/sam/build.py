"""SAM model registry + composite module.

Parity targets: /root/reference/sam/build_sam.py (vit_b/l/h registry,
prompt_embed_dim 256, image 1024, patch 16) and /root/reference/sam/
modeling/sam.py (the composite with the one-encode/many-decode split:
``forward_image_embedding`` / ``decode_from_embedding``).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .image_encoder import ImageEncoderViT
from .mask_decoder import MaskDecoder
from .prompt_encoder import PromptEncoder

# ImageNet pixel stats used by the reference (sam/build_sam.py:92-93).
PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


@dataclasses.dataclass(frozen=True)
class SamConfig:
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    img_size: int = 1024
    patch_size: int = 16
    prompt_embed_dim: int = 256
    window_size: int = 14
    dtype: str = "float32"
    attn_impl: str = "xla"
    twoway_impl: str = "auto"  # fused Pallas mask-decoder block kernels
    remat: bool = False

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size


SAM_VARIANTS = {
    # Reference sam/build_sam.py:14-44.
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12, global_attn_indexes=(2, 5, 8, 11)),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16, global_attn_indexes=(5, 11, 17, 23)),
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16, global_attn_indexes=(7, 15, 23, 31)),
    # Size aliases used by configs (SAM_SIZE: base/large/huge).
    "base": dict(embed_dim=768, depth=12, num_heads=12, global_attn_indexes=(2, 5, 8, 11)),
    "large": dict(embed_dim=1024, depth=24, num_heads=16, global_attn_indexes=(5, 11, 17, 23)),
    "huge": dict(embed_dim=1280, depth=32, num_heads=16, global_attn_indexes=(7, 15, 23, 31)),
}


class Sam(nn.Module):
    """Composite SAM: image encoder + prompt encoder + mask decoder.

    Methods mirror the intended reference contract (sam/modeling/sam.py:52-136
    + SURVEY.md §2.9): ``encode_image`` runs the heavy ViT once and returns
    ``(sam_embedding, fpn_dict)``; ``decode_from_embedding`` is the cheap
    per-prompt path returning the unified-head features.
    """

    cfg: SamConfig = SamConfig()

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        self.image_encoder = ImageEncoderViT(
            img_size=c.img_size,
            patch_size=c.patch_size,
            embed_dim=c.embed_dim,
            depth=c.depth,
            num_heads=c.num_heads,
            out_chans=c.prompt_embed_dim,
            window_size=c.window_size,
            global_attn_indexes=tuple(c.global_attn_indexes),
            dtype=dtype,
            attn_impl=c.attn_impl,
            remat=c.remat,
        )
        self.prompt_encoder = PromptEncoder(
            embed_dim=c.prompt_embed_dim,
            image_embedding_size=(c.grid, c.grid),
            input_image_size=(c.img_size, c.img_size),
            dtype=dtype,
        )
        self.mask_decoder = MaskDecoder(
            transformer_dim=c.prompt_embed_dim, dtype=dtype,
            twoway_impl=c.twoway_impl,
        )

    def normalize(self, images: jax.Array) -> jax.Array:
        """Raw RGB uint8/float (B, H, W, 3) -> normalized float."""
        mean = jnp.asarray(PIXEL_MEAN, jnp.float32)
        std = jnp.asarray(PIXEL_STD, jnp.float32)
        return (images.astype(jnp.float32) - mean) / std

    def encode_image(self, images: jax.Array):
        """images: normalized (B, H, W, 3). Returns (sam_embedding, fpn)."""
        return self.image_encoder(images)

    def decode_from_embedding(
        self, sam_embedding, points=None, labels=None, boxes=None, masks=None
    ):
        """Per-prompt decode. sam_embedding (1 or B, H, W, 256) — batch-1 is
        the fast path (shared image, per-prompt tokens; the mask decoder
        broadcasts it lazily instead of the caller tiling it). Returns the
        MaskDecoder dict."""
        sparse, dense = self.prompt_encoder(
            points=points, labels=labels, boxes=boxes, masks=masks,
            batch=sam_embedding.shape[0],
        )
        image_pe = self.prompt_encoder.get_dense_pe()
        return self.mask_decoder(sam_embedding, image_pe, sparse, dense)

    def __call__(self, images, points=None, labels=None, boxes=None, masks=None):
        sam_embedding, fpn = self.encode_image(self.normalize(images))
        out = self.decode_from_embedding(sam_embedding, points, labels, boxes, masks)
        out["fpn"] = fpn
        out["sam_embedding"] = sam_embedding
        return out


def build_sam(variant: str = "vit_b", **overrides) -> Sam:
    cfg = SamConfig(**{**SAM_VARIANTS[variant], **overrides})
    return Sam(cfg=cfg)


sam_model_registry = {
    name: (lambda name=name: (lambda **kw: build_sam(name, **kw)))()
    for name in SAM_VARIANTS
}
