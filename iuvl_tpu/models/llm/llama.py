"""LLaMA/Vicuna decoder, TPU-native.

Role of /root/reference/llm/ (load_llm.py prepare_llm + llava.py
LlavaLlamaForCausalLM): the frozen Vicuna-7B-v1.5 language model that
consumes spliced image features. Rebuilt as a JAX transformer rather than a
wrapper over HF torch: RMSNorm, rotary position embeddings, SwiGLU MLP,
grouped/causal attention with a static-shape KV cache for jitted
autoregressive decoding.

Tensor parallelism: ``llama_param_shardings`` returns a PartitionSpec tree
sharding attention heads and MLP hidden over the ``model`` mesh axis
(column-parallel in-projections, row-parallel out-projections — XLA inserts
the psum on the row-parallel matmuls). The reference's bitsandbytes 8-bit
quantization maps to bf16 params here (int8 via AQT is a later option).

Default config = Vicuna-7B v1.5 (LLaMA-2 7B shapes): dim 4096, 32 layers,
32 heads, ffn 11008, vocab 32000, rope theta 10000, max ctx 1024
(reference load_llm.py:54 model_max_length).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    layers: int = 32
    heads: int = 32
    kv_heads: int = 32
    ffn_dim: int = 11008
    max_seq_len: int = 1024
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    dtype: str = "bfloat16"
    param_dtype: str = "float32"  # storage dtype of the weights; serving a
    # frozen 7B uses "bfloat16" (13.5 GB fits v5e HBM; fp32 would not)
    quant: str = "none"  # "int8" = weight-only per-channel int8 (the
    # reference's bitsandbytes 8-bit load, llm/load_llm.py:29-49): halves
    # the HBM weight footprint/traffic of the frozen 7B at serving time.


def rotary_embed(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """x: (B, T, H, D); positions: (B, T). Applies RoPE over D pairs."""
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    angles = positions[..., None].astype(jnp.float32) * freqs  # (B, T, D/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        norm = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + self.eps)
        return (norm * w).astype(x.dtype)


class QuantDense(nn.Module):
    """Weight-only int8 linear: int8 kernel + per-output-channel fp32 scale
    (absmax). The dequant multiply fuses into the matmul's operand read, so
    weights stream from HBM as int8. Populate params via
    ``quant.quantize_llama_params`` on a trained fp tree."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kq = self.param(
            "kernel_q", nn.initializers.zeros_init(), (in_f, self.features),
            jnp.int8,
        )
        scale = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,),
            jnp.float32,
        )
        w = kq.astype(self.dtype) * scale.astype(self.dtype)[None, :]
        return x @ w


def _dense(cfg: LlamaConfig, features: int, name: str):
    dtype = jnp.dtype(cfg.dtype)
    if cfg.quant == "int8":
        return QuantDense(features=features, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=False, dtype=dtype,
                    param_dtype=jnp.dtype(cfg.param_dtype), name=name)


class LlamaAttention(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, positions, mask, cache: Optional[dict] = None):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        head_dim = c.dim // c.heads
        b, t, _ = x.shape

        q = _dense(c, c.heads * head_dim, "q_proj")(x)
        k = _dense(c, c.kv_heads * head_dim, "k_proj")(x)
        v = _dense(c, c.kv_heads * head_dim, "v_proj")(x)
        q = q.reshape(b, t, c.heads, head_dim)
        k = k.reshape(b, t, c.kv_heads, head_dim)
        v = v.reshape(b, t, c.kv_heads, head_dim)
        q = rotary_embed(q, positions, c.rope_theta)
        k = rotary_embed(k, positions, c.rope_theta)

        if cache is not None:
            # Static-size cache update at the current offset.
            k_cache = jax.lax.dynamic_update_slice(
                cache["k"], k, (0, cache["offset"], 0, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                cache["v"], v, (0, cache["offset"], 0, 0)
            )
            cache["k"], cache["v"] = k_cache, v_cache
            k, v = k_cache, v_cache

        if c.kv_heads != c.heads:
            rep = c.heads // c.kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        attn = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / (head_dim ** 0.5)
        attn = attn + mask  # (B or 1, 1, T, S) additive
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, -1)
        return _dense(c, c.dim, "o_proj")(out)


class LlamaBlock(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, positions, mask, cache=None):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        h = RMSNorm(eps=c.rms_eps, name="input_norm")(x)
        x = x + LlamaAttention(cfg=c, name="attn")(h, positions, mask, cache)
        h = RMSNorm(eps=c.rms_eps, name="post_attn_norm")(x)
        gate = _dense(c, c.ffn_dim, "gate_proj")(h)
        up = _dense(c, c.ffn_dim, "up_proj")(h)
        down = _dense(c, c.dim, "down_proj")(nn.silu(gate) * up)
        return x + down


class LlamaForCausalLM(nn.Module):
    cfg: LlamaConfig = LlamaConfig()

    def setup(self):
        c = self.cfg
        self.embed_tokens = self.param(
            "embed_tokens", nn.initializers.normal(0.02),
            (c.vocab_size, c.dim), jnp.dtype(c.param_dtype),
        )
        self.blocks = [
            LlamaBlock(cfg=c, name=f"layer{i}") for i in range(c.layers)
        ]
        self.norm = RMSNorm(eps=c.rms_eps, name="final_norm")
        self.lm_head = self.param(
            "lm_head", nn.initializers.normal(0.02),
            (c.dim, c.vocab_size), jnp.dtype(c.param_dtype),
        )

    def embed(self, input_ids: jax.Array) -> jax.Array:
        return jnp.take(self.embed_tokens, input_ids, axis=0).astype(
            jnp.dtype(self.cfg.dtype)
        )

    def __call__(
        self,
        inputs_embeds: jax.Array,  # (B, T, D)
        attention_mask: Optional[jax.Array] = None,  # (B, T) 1 = valid
        positions: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Full-sequence forward -> logits (B, T, V)."""
        b, t, _ = inputs_embeds.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
        causal = jnp.triu(jnp.full((t, t), -1e9, jnp.float32), k=1)[None, None]
        mask = causal
        if attention_mask is not None:
            pad = jnp.where(attention_mask[:, None, None, :] == 0, -1e9, 0.0)
            mask = causal + pad
        x = inputs_embeds
        for blk in self.blocks:
            x = blk(x, positions, mask)
        x = self.norm(x)
        # bf16 operands with fp32 MXU accumulation: avoids materializing an
        # fp32 copy of the 512 MB lm_head on every call.
        return jnp.dot(x, self.lm_head.astype(x.dtype),
                       preferred_element_type=jnp.float32)

    # ------------------------- decoding ------------------------- #
    def init_cache(self, batch: int) -> list[dict]:
        c = self.cfg
        head_dim = c.dim // c.heads
        return [
            {
                "k": jnp.zeros((batch, c.max_seq_len, c.kv_heads, head_dim),
                               jnp.dtype(c.dtype)),
                "v": jnp.zeros((batch, c.max_seq_len, c.kv_heads, head_dim),
                               jnp.dtype(c.dtype)),
                "offset": 0,
            }
            for _ in range(c.layers)
        ]

    def prefill(self, inputs_embeds: jax.Array, attention_mask: jax.Array):
        """Full-prompt forward that also fills fresh KV caches.
        Returns (last-position logits (B, V), caches)."""
        b, t, _ = inputs_embeds.shape
        caches = self.init_cache(b)
        positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
        # Keys live in the full-length cache: causal over the first t slots,
        # masked beyond; prompt padding masked via attention_mask.
        key_pos = jnp.arange(self.cfg.max_seq_len)[None, None, None, :]
        q_pos = jnp.arange(t)[None, None, :, None]
        mask = jnp.where(key_pos <= q_pos, 0.0, -1e9)
        pad = jnp.pad(
            attention_mask, ((0, 0), (0, self.cfg.max_seq_len - t)),
            constant_values=0,
        )
        mask = mask + jnp.where(pad[:, None, None, :] == 0, -1e9, 0.0)
        # Guard: query attends at least to itself (avoid all -inf rows).
        mask = jnp.where(key_pos == q_pos, 0.0, mask)
        x = inputs_embeds
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            cache = dict(cache, offset=0)
            x = blk(x, positions, mask, cache)
            new_caches.append({"k": cache["k"], "v": cache["v"], "offset": 0})
        x = self.norm(x)
        logits = jnp.dot(x[:, -1], self.lm_head.astype(x.dtype),
                         preferred_element_type=jnp.float32)
        return logits, new_caches

    def decode_step(
        self, x_embed: jax.Array, caches: list[dict], offset,
        pad_mask: Optional[jax.Array] = None,
    ):
        """One token step with KV caches. x_embed (B, 1, D);
        pad_mask (B, max_seq_len) True = never attend (prompt padding).
        Returns (logits (B, V), updated caches)."""
        c = self.cfg
        b = x_embed.shape[0]
        positions = jnp.broadcast_to(jnp.asarray(offset)[None, None], (b, 1))
        key_pos = jnp.arange(c.max_seq_len)[None, None, None]
        mask = jnp.where(key_pos <= offset, 0.0, -1e9)
        if pad_mask is not None:
            mask = mask + jnp.where(pad_mask[:, None, None, :], -1e9, 0.0)
        x = x_embed
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            cache = dict(cache, offset=offset)
            x = blk(x, positions, mask, cache)
            new_caches.append({"k": cache["k"], "v": cache["v"], "offset": offset})
        x = self.norm(x)
        logits = jnp.dot(x[:, 0], self.lm_head.astype(x.dtype),
                         preferred_element_type=jnp.float32)
        return logits, new_caches


def llama_param_shardings(params: Any) -> Any:
    """PartitionSpec tree for tensor parallelism over the 'model' axis."""

    def spec(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if name.endswith("kernel_scale"):
            # Per-output-channel scales follow the kernel's output sharding.
            if any(s in name for s in ("q_proj", "k_proj", "v_proj",
                                       "gate_proj", "up_proj")):
                return P("model")
            return P()
        if leaf.ndim != 2:
            return P()
        if any(s in name for s in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")):
            return P(None, "model")  # column parallel
        if any(s in name for s in ("o_proj", "down_proj")):
            return P("model", None)  # row parallel
        if "embed_tokens" in name or "lm_head" in name:
            return P(None, "model")
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)
