"""SAM prompt encoder, TPU-native.

Parity target: /root/reference/sam/modeling/prompt_encoder.py. Encodes
point/box/mask prompts into sparse token embeddings + a dense NHWC map.

TPU-first deviations from the reference's ragged API: prompts are always
static-shape batches — points ``(B, N, 2)`` with labels ``(B, N)`` where
label -1 marks padding (the reference appends exactly one such pad point
when boxes are absent; callers here pad to a fixed N). Boxes are ``(B, 4)``
(xyxy) producing two corner tokens. All branches are compiled once; no
data-dependent shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .image_encoder import LayerNorm2d, gelu


class PositionEmbeddingRandom(nn.Module):
    """Fourier random-feature positional encoding
    (reference prompt_encoder.py:177-220). The gaussian projection matrix is
    a parameter (frozen in practice; loaded from checkpoints for parity)."""

    num_pos_feats: int = 128

    @nn.compact
    def __call__(self, coords: jax.Array) -> jax.Array:
        """coords in [0, 1], shape (..., 2) -> (..., 2*num_pos_feats)."""
        gauss = self.param(
            "gaussian_matrix", nn.initializers.normal(1.0), (2, self.num_pos_feats)
        )
        c = 2.0 * coords.astype(jnp.float32) - 1.0
        c = (2.0 * np.pi) * (c @ gauss)
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def grid(self, size: tuple[int, int]) -> jax.Array:
        """Dense PE for an (H, W) grid -> (H, W, C).
        Reference prompt_encoder.py:200-211."""
        h, w = size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
        return self(grid)


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: tuple[int, int] = (64, 64)
    input_image_size: tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        # 4 type embeddings: neg point, pos point, box corner 1, box corner 2.
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim)
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.mask_conv1 = nn.Conv(
            self.mask_in_chans // 4, (2, 2), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="mask_conv1",
        )
        self.mask_ln1 = LayerNorm2d(name="mask_ln1")
        self.mask_conv2 = nn.Conv(
            self.mask_in_chans, (2, 2), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="mask_conv2",
        )
        self.mask_ln2 = LayerNorm2d(name="mask_ln2")
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="mask_conv3")

    def get_dense_pe(self) -> jax.Array:
        """(H, W, C) positional map matching the image embedding grid."""
        return self.pe_layer.grid(self.image_embedding_size)

    def _embed_points(self, points: jax.Array, labels: jax.Array) -> jax.Array:
        """points (B, N, 2) xy pixel coords; labels (B, N) in {-1, 0, 1}.
        Reference prompt_encoder.py:73-97."""
        h, w = self.input_image_size
        coords = (points.astype(jnp.float32) + 0.5) / jnp.asarray(
            [w, h], dtype=jnp.float32
        )
        pe = self.pe_layer(coords)  # (B, N, C)
        lab = labels[..., None]
        out = jnp.where(lab == -1, self.not_a_point_embed[0], pe)
        out = jnp.where(lab == 0, pe + self.point_embeddings[0], out)
        out = jnp.where(lab == 1, pe + self.point_embeddings[1], out)
        return out

    def _embed_boxes(self, boxes: jax.Array) -> jax.Array:
        """boxes (B, 4) xyxy -> (B, 2, C). Reference prompt_encoder.py:99-106."""
        h, w = self.input_image_size
        corners = (boxes.reshape(-1, 2, 2).astype(jnp.float32) + 0.5) / jnp.asarray(
            [w, h], dtype=jnp.float32
        )
        pe = self.pe_layer(corners)
        pe = pe.at[:, 0, :].add(self.point_embeddings[2])
        pe = pe.at[:, 1, :].add(self.point_embeddings[3])
        return pe

    def _embed_masks(self, masks: jax.Array) -> jax.Array:
        """masks (B, 4H, 4W, 1) -> dense (B, H, W, C)."""
        y = self.mask_conv1(masks)
        y = gelu(self.mask_ln1(y))
        y = self.mask_conv2(y)
        y = gelu(self.mask_ln2(y))
        return self.mask_conv3(y)

    def __call__(self, points=None, labels=None, boxes=None, masks=None, batch=1):
        """Returns (sparse (B, T, C), dense (B, H, W, C))."""
        sparse_parts = []
        if points is not None:
            bs = points.shape[0]
            if boxes is None:
                # Reference pads with one not-a-point token when no boxes.
                pad_pt = jnp.zeros((bs, 1, 2), points.dtype)
                pad_lab = -jnp.ones((bs, 1), labels.dtype)
                points = jnp.concatenate([points, pad_pt], axis=1)
                labels = jnp.concatenate([labels, pad_lab], axis=1)
            sparse_parts.append(self._embed_points(points, labels))
        if boxes is not None:
            bs = boxes.shape[0]
            sparse_parts.append(self._embed_boxes(boxes))
        if not sparse_parts:
            bs = batch
            sparse = jnp.zeros((bs, 0, self.embed_dim), jnp.float32)
        else:
            sparse = jnp.concatenate(sparse_parts, axis=1)

        if masks is not None:
            dense = self._embed_masks(masks)
        else:
            # Batch-1 broadcast map: the no-mask dense embedding is prompt-
            # independent, and keeping it batch-1 lets the mask decoder keep
            # the shared image embedding batch-1 through block 0 (see
            # TwoWayTransformer) instead of tiling it per prompt.
            h, w = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed.reshape(1, 1, 1, -1), (1, h, w, self.embed_dim)
            )
        return sparse.astype(self.dtype), dense.astype(self.dtype)
