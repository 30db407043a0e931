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
    """Reference LangEncoder/transformer.py:44-78.

    Setup-style (identical param tree to the earlier compact version) so
    ``step`` — the single-position KV-cached decode used by the cached
    captioning path — shares the same parameters as ``__call__``."""

    d_model: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.ln_1 = TFLayerNorm(name="ln_1")
        self.in_proj = nn.Dense(3 * self.d_model, dtype=self.dtype, name="in_proj")
        self.out_proj = nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")
        self.ln_2 = TFLayerNorm(name="ln_2")
        self.c_fc = nn.Dense(self.d_model * 4, dtype=self.dtype, name="c_fc")
        self.c_proj = nn.Dense(self.d_model, dtype=self.dtype, name="c_proj")

    def _mlp(self, x):
        y = self.ln_2(x)
        y = self.c_fc(y)
        y = y * jax.nn.sigmoid(1.702 * y)  # QuickGELU
        return x + self.c_proj(y)

    def __call__(self, x, causal_mask=None, key_padding_mask=None):
        y = self.ln_1(x)
        y = self._attention(y, causal_mask, key_padding_mask)
        return self._mlp(x + y)

    def _split_heads(self, t):
        b, n, _ = t.shape
        return t.reshape(b, n, self.n_head, -1).transpose(0, 2, 1, 3)

    def _attention(self, x, causal_mask, key_padding_mask):
        b, n, c = x.shape
        head_dim = c // self.n_head
        # Single packed in-projection to mirror torch MultiheadAttention.
        qkv = self.in_proj(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (self._split_heads(t) for t in (q, k, v))
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
        return self.out_proj(out)

    def step(self, x_row, k_cache, v_cache, pos):
        """One causal position with a growing K/V cache.

        x_row: (B, 1, C) the block input at position ``pos``; k_cache /
        v_cache: (B, T, C) with rows < pos valid. Returns
        (out_row, k_cache, v_cache). Exact same math as ``__call__``'s row
        ``pos`` under the causal mask (softmax over positions <= pos in
        fp32; future cache rows masked to -inf like the triu mask)."""
        b, _, c = x_row.shape
        head_dim = c // self.n_head
        t = k_cache.shape[1]
        y = self.ln_1(x_row)
        qkv = self.in_proj(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # each (B, 1, C)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k.astype(k_cache.dtype), (0, pos, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v.astype(v_cache.dtype), (0, pos, 0))
        qh = self._split_heads(q)  # (B, H, 1, d)
        kh = self._split_heads(k_cache)
        vh = self._split_heads(v_cache)
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) / (head_dim ** 0.5)
        future = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, t), 3) > pos
        attn = jnp.where(future, -jnp.inf, attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)
        return self._mlp(x_row + self.out_proj(out)), k_cache, v_cache


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

    def init_cache(self, batch: int):
        """Zeroed per-layer (k, v) caches for ``decode_step``:
        a list of ``layers`` pairs of (B, context_length, width)."""
        z = jnp.zeros((batch, self.context_length, self.width), self.dtype)
        return [(z, z) for _ in range(self.layers)]

    def decode_step(self, token_ids, pos, caches):
        """One causal position through the whole tower with KV caches.

        token_ids: (B,) the id at position ``pos``; caches: as produced by
        ``init_cache``/previous steps. Returns (hidden_row (B, 1, width),
        caches). Row ``pos`` of ``__call__`` exactly (the tower is causal,
        so positions < pos — already in the caches — fully determine it)."""
        x = jnp.take(self.token_embedding, token_ids, axis=0)[:, None, :]
        x = x + jax.lax.dynamic_slice_in_dim(
            self.positional_embedding, pos, 1, axis=0
        )[None]
        x = x.astype(self.dtype)
        new_caches = []
        for blk, (k_c, v_c) in zip(self.resblocks, caches):
            x, k_c, v_c = blk.step(x, k_c, v_c, pos)
            new_caches.append((k_c, v_c))
        return self.ln_final(x), new_caches


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

    def init_text_cache(self, batch: int):
        return self.lang_encoder.init_cache(batch)

    def forward_token_step(self, token_ids, pos, caches):
        """Incremental counterpart of ``forward_language_token`` for one
        position: (B,) ids at ``pos`` -> ((B, 1, proj) projected token
        embedding row, caches)."""
        hidden, caches = self.lang_encoder.decode_step(token_ids, pos, caches)
        return hidden @ self.lang_proj, caches

    def compute_similarity(self, v_emb, text_emb):
        """logit_scale * cos-sim of visual embeddings vs class text embeddings.
        Reference vlpencoder.py:239-245. v_emb (B, Q, D), text_emb (K, D)."""
        v = v_emb / (jnp.linalg.norm(v_emb, axis=-1, keepdims=True) + 1e-7)
        return jnp.exp(self.logit_scale) * jnp.einsum("bqd,kd->bqk", v, text_emb)

    def __call__(self, input_ids, attention_mask=None):
        return self.forward_language(input_ids, attention_mask)
