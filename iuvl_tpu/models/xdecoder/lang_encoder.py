"""CLIP-style text encoder + language head, TPU-native.

Parity targets: /root/reference/modeling/language/LangEncoder/transformer.py
(causal text Transformer: token embedding + learned positional embedding +
N residual blocks with QuickGELU MLP and TF-style fp32 LayerNorm eps=1e-12)
and /root/reference/modeling/language/vlpencoder.py (LanguageEncoder: eot
pooling at argmax(input_ids), ``lang_proj`` projection to the syslearner
dim, learnable ``logit_scale``, ``compute_similarity``).

TPU design: text embedding caches (per-class-name prompt ensembles) are
computed by jitted batched forwards and stored as plain arrays in the state
(not module attributes); the tokenizer stays host-side
(iuvl_tpu/data/tokenizer.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class TFLayerNorm(nn.Module):
    """fp32 LayerNorm with eps inside the sqrt (reference
    LangEncoder/transformer.py:21-36), eps=1e-12."""

    epsilon: float = 1e-12

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(-1, keepdims=True)
        y = (xf - mean) / jnp.sqrt(var + self.epsilon)
        return (scale * y + bias).astype(x.dtype)


class ResidualAttentionBlock(nn.Module):
    """Reference LangEncoder/transformer.py:44-78."""

    d_model: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask=None, key_padding_mask=None):
        y = TFLayerNorm(name="ln_1")(x)
        y = self._attention(y, causal_mask, key_padding_mask)
        x = x + y
        y = TFLayerNorm(name="ln_2")(x)
        y = nn.Dense(self.d_model * 4, dtype=self.dtype, name="c_fc")(y)
        y = y * jax.nn.sigmoid(1.702 * y)  # QuickGELU
        y = nn.Dense(self.d_model, dtype=self.dtype, name="c_proj")(y)
        return x + y

    def _attention(self, x, causal_mask, key_padding_mask):
        b, n, c = x.shape
        head_dim = c // self.n_head
        # Single packed in-projection to mirror torch MultiheadAttention.
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(b, n, self.n_head, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / (head_dim ** 0.5)
        if causal_mask is not None:
            attn = attn + causal_mask
        if key_padding_mask is not None:
            attn = jnp.where(
                key_padding_mask[:, None, None, :], jnp.float32(-1e9), attn
            )
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class TextTransformer(nn.Module):
    """Reference LangEncoder/transformer.py:81-206."""

    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    autoregressive: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.token_embedding = self.param(
            "token_embedding",
            nn.initializers.truncated_normal(0.02),
            (self.vocab_size, self.width),
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.truncated_normal(0.02),
            (self.context_length, self.width),
        )
        self.resblocks = [
            ResidualAttentionBlock(
                d_model=self.width, n_head=self.heads, dtype=self.dtype,
                name=f"block{i}",
            )
            for i in range(self.layers)
        ]
        self.ln_final = TFLayerNorm(name="ln_final")

    def token_table(self) -> jax.Array:
        """Raw token-embedding matrix (V, width) — used by the captioning
        decode head (reference xdecoder.py:359,411)."""
        return self.token_embedding

    def __call__(self, input_ids, attention_mask=None):
        tok = self.token_embedding
        pos = self.positional_embedding
        n = input_ids.shape[1]
        x = jnp.take(tok, input_ids, axis=0) + pos[None, :n]
        x = x.astype(self.dtype)

        causal = None
        key_padding = None
        if self.autoregressive:
            causal = jnp.triu(
                jnp.full((n, n), -jnp.inf, dtype=jnp.float32), k=1
            )[None, None]
        elif attention_mask is not None:
            key_padding = attention_mask == 0

        for blk in self.resblocks:
            x = blk(x, causal, key_padding)

        return self.ln_final(x)


class LanguageEncoder(nn.Module):
    """Reference vlpencoder.py:21-245. Methods return raw embeddings; the
    class-name embedding cache lives outside the module (see
    models/xdecoder/model.py)."""

    width: int = 512
    proj_dim: int = 512  # SYSLEARNER_DIM
    layers: int = 12
    heads: int = 8
    context_length: int = 77
    vocab_size: int = 49408
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.lang_encoder = TextTransformer(
            context_length=self.context_length,
            vocab_size=self.vocab_size,
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            dtype=self.dtype,
        )
        self.lang_proj = self.param(
            "lang_proj",
            nn.initializers.truncated_normal(0.02),
            (self.width, self.proj_dim),
        )
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.ones, ()
        )

    def _pool_eot(self, hidden, input_ids):
        """CLIP pooling: feature at the eot token (= argmax of token ids)."""
        idx = jnp.argmax(input_ids, axis=-1)
        return jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]

    def forward_language(self, input_ids, attention_mask=None, norm=True):
        """(B, T) ids -> (B, proj_dim) pooled + projected embedding.
        Reference vlpencoder.py:207-219."""
        hidden = self.lang_encoder(input_ids, attention_mask)
        x = self._pool_eot(hidden, input_ids)
        x = x @ self.lang_proj
        if norm:
            x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-7)
        return x

    def forward_language_token(self, input_ids, attention_mask=None, norm=False):
        """Returns (token_emb (B, T, proj), class_emb (B, proj)).
        Reference vlpencoder.py:221-237."""
        hidden = self.lang_encoder(input_ids, attention_mask)
        class_x = self._pool_eot(hidden, input_ids) @ self.lang_proj
        token_x = hidden @ self.lang_proj
        if norm:
            class_x = class_x / (jnp.linalg.norm(class_x, axis=-1, keepdims=True) + 1e-7)
            token_x = token_x / (jnp.linalg.norm(token_x, axis=-1, keepdims=True) + 1e-7)
        return token_x, class_x

    def compute_similarity(self, v_emb, text_emb):
        """logit_scale * cos-sim of visual embeddings vs class text embeddings.
        Reference vlpencoder.py:239-245. v_emb (B, Q, D), text_emb (K, D)."""
        v = v_emb / (jnp.linalg.norm(v_emb, axis=-1, keepdims=True) + 1e-7)
        return jnp.exp(self.logit_scale) * jnp.einsum("bqd,kd->bqk", v, text_emb)

    def __call__(self, input_ids, attention_mask=None):
        return self.forward_language(input_ids, attention_mask)
