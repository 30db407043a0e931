"""Sine positional embeddings (DETR-style).

Parity target: /root/reference/modeling/modules/position_encoding.py
(PositionEmbeddingSine with normalize=True). With no padding mask, the
cumsum-of-ones formulation reduces to closed form: embed_i = (i + 1) and
normalized by (size + eps) * scale — computed here directly (static shapes,
no mask support needed on TPU since batches are densely padded and the
reference never passes a mask either: transformer_encoder_deform.py:63).
Returns NHWC.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def position_embedding_sine(
    h: int,
    w: int,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Returns (h, w, 2 * num_pos_feats): concat(pos_y, pos_x) like the
    reference's channel ordering."""
    if scale is None:
        scale = 2 * math.pi
    eps = 1e-6
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]  # cumsum of ones
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    if normalize:
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    y = jnp.broadcast_to(y, (h, w))
    x = jnp.broadcast_to(x, (h, w))

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x[..., None] / dim_t  # (h, w, F)
    pos_y = y[..., None] / dim_t
    # Interleave sin on even dims, cos on odd dims.
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1)
    pos_x = pos_x.reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1)
    pos_y = pos_y.reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)
