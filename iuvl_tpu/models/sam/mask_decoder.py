"""SAM two-way-transformer mask decoder, TPU-native.

Parity targets: /root/reference/sam/modeling/transformer.py (TwoWayTransformer)
and /root/reference/sam/modeling/mask_decoder.py (MaskDecoder, "LBK" variant).

The decoder returns BOTH output conventions (SURVEY.md §7 step 2):
- the classic SAM outputs ``masks`` (hyper_in @ upscaled) and ``iou_pred``;
- the reference-intended unified-head inputs ``upscaled_embedding`` (NHWC,
  transformer_dim/8 channels at 4x the embedding grid) and ``hyper_in``
  (B, num_mask_tokens, transformer_dim/8), which GeneralizedXdecoder injects
  into the X-Decoder head for interactive/vlp/llm tasks.

All prompt batching is dense: callers tile the image embedding per prompt set
(the one-encode/many-decode flow lives in models/xdecoder/model.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .image_encoder import LayerNorm2d


class DownsampledAttention(nn.Module):
    """Attention with internal-dim downsampling
    (reference sam/modeling/transformer.py:185-240)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
        internal = self.embedding_dim // self.downsample_rate
        head_dim = internal // self.num_heads
        qp = nn.Dense(internal, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(internal, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        qp, kp, vp = split(qp), split(kp), split(vp)
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", qp, kp, preferred_element_type=jnp.float32
        ) / (head_dim ** 0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(vp.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vp)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, internal)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """Reference sam/modeling/transformer.py:109-182."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)
        if self.skip_first_layer_pe:
            queries = DownsampledAttention(
                self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn"
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DownsampledAttention(
                self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn"
            )(q, q, queries)
        queries = ln("norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownsampledAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_t2i",
        )(q, k, keys)
        queries = ln("norm2")(queries)

        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_lin1")(queries)
        y = nn.relu(y)
        y = nn.Dense(self.embedding_dim, dtype=self.dtype, name="mlp_lin2")(y)
        queries = ln("norm3")(queries + y)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownsampledAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_i2t",
        )(k, q, queries)
        keys = ln("norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """Reference sam/modeling/transformer.py:16-106."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: (B, H, W, C); point_embedding: (B, N, C).
        Returns (queries (B, N, C), keys (B, HW, C))."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(b, h * w, c).astype(keys.dtype)
        queries = point_embedding

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                dtype=self.dtype,
                name=f"layer{i}",
            )(queries, keys, point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + DownsampledAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            dtype=self.dtype, name="final_attn_t2i",
        )(q, k, keys)
        queries = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, name="norm_final_attn"
        )(queries)
        return queries, keys


class HyperMLP(nn.Module):
    """3-layer ReLU MLP (reference mask_decoder.py:177-199)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"lin{i}")(x))
        return nn.Dense(self.output_dim, dtype=self.dtype, name=f"lin{self.num_layers - 1}")(x)


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    transformer_mlp_dim: int = 2048
    transformer_num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1

    @nn.compact
    def __call__(
        self,
        image_embeddings: jax.Array,  # (B, H, W, C)
        image_pe: jax.Array,  # (H, W, C) or (B, H, W, C)
        sparse_prompt_embeddings: jax.Array,  # (B, T, C)
        dense_prompt_embeddings: jax.Array,  # (B, H, W, C)
    ) -> dict[str, Any]:
        b = sparse_prompt_embeddings.shape[0]
        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, self.transformer_dim)
        )
        mask_tokens = self.param(
            "mask_tokens",
            nn.initializers.normal(1.0),
            (self.num_mask_tokens, self.transformer_dim),
        )
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [
                jnp.broadcast_to(output_tokens[None], (b, *output_tokens.shape)),
                sparse_prompt_embeddings,
            ],
            axis=1,
        ).astype(self.dtype)

        src = image_embeddings + dense_prompt_embeddings
        if image_pe.ndim == 3:
            image_pe = jnp.broadcast_to(image_pe[None], src.shape)

        hs, keys = TwoWayTransformer(
            embedding_dim=self.transformer_dim,
            mlp_dim=self.transformer_mlp_dim,
            num_heads=self.transformer_num_heads,
            dtype=self.dtype,
            name="transformer",
        )(src.astype(self.dtype), image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + self.num_mask_tokens]

        bh, hgrid, wgrid, c = src.shape
        src_out = keys.reshape(bh, hgrid, wgrid, c)
        # Upscaling stack (reference mask_decoder.py:53-59).
        y = nn.ConvTranspose(
            self.transformer_dim // 4, (2, 2), strides=(2, 2),
            transpose_kernel=True, dtype=self.dtype,
            name="upscale_deconv1",
        )(src_out)
        y = nn.gelu(LayerNorm2d(name="upscale_ln")(y), approximate=False)
        y = nn.ConvTranspose(
            self.transformer_dim // 8, (2, 2), strides=(2, 2),
            transpose_kernel=True, dtype=self.dtype,
            name="upscale_deconv2",
        )(y)
        upscaled = nn.gelu(y, approximate=False)  # (B, 4H, 4W, C/8)

        hyper_in = jnp.stack(
            [
                HyperMLP(
                    self.transformer_dim, self.transformer_dim // 8,
                    dtype=self.dtype, name=f"hyper_mlp{i}",
                )(mask_tokens_out[:, i])
                for i in range(self.num_mask_tokens)
            ],
            axis=1,
        )  # (B, M, C/8)

        bu, hu, wu, cu = upscaled.shape
        masks = jnp.einsum(
            "bmc,bhwc->bmhw", hyper_in, upscaled, preferred_element_type=jnp.float32
        )
        iou_pred = HyperMLP(
            self.iou_head_hidden_dim, self.num_mask_tokens,
            num_layers=self.iou_head_depth, dtype=self.dtype, name="iou_head",
        )(iou_token_out)

        return {
            "masks": masks,  # (B, M, 4H, 4W) logits
            "iou_pred": iou_pred,  # (B, M)
            "upscaled_embedding": upscaled,  # (B, 4H, 4W, C/8)
            "hyper_in": hyper_in,  # (B, M, C/8)
        }
