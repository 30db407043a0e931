"""LLaVA-style multimodal input preparation + causal LM loss + generation.

Parity targets: /root/reference/llm/llava_arch.py:64-195
(prepare_inputs_labels_for_multimodal — splice projected image features at
IMAGE_TOKEN_INDEX = -200), llm/utils.py:72-117 (tokenizer_image_token,
collator; IGNORE_INDEX = -100), and the HF generate call in
xdecoder_model.py:611-617.

TPU-static redesign: the ragged python splice becomes a fixed-layout
scatter — every sequence reserves exactly ``num_image_tokens`` slots at the
(per-sample) image position; sequences are right-padded to a static length.
Greedy generation is one jitted ``lax.scan`` over steps with the KV cache.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200
NUM_IMAGE_TOKENS = 100  # object-query features spliced (reference :308)


def tokenizer_image_token(prompt: str, tokenizer, image_token: str = "<image>"):
    """Split on <image>, tokenize chunks, insert IMAGE_TOKEN_INDEX
    (reference llm/utils.py:72-91). Returns list[int] with one -200."""
    chunks = prompt.split(image_token)
    ids: list[int] = []
    for i, chunk in enumerate(chunks):
        if i > 0:
            ids.append(IMAGE_TOKEN_INDEX)
        ids.extend(tokenizer.encode_text(chunk))
    return ids


def splice_image_features(
    input_ids: np.ndarray,  # (B, T) with one IMAGE_TOKEN_INDEX per row
    embed_fn,  # token ids -> embeddings (jax)
    image_features: jax.Array,  # (B, N_img, D) projected features
    labels: Optional[np.ndarray] = None,  # (B, T) or None
    max_len: int = 1024,
    pad_id: int = 0,
):
    """Build (inputs_embeds (B, L, D), attention_mask (B, L), labels (B, L))
    with image slots expanded in place (static L = max_len)."""
    b, t = input_ids.shape
    n_img = image_features.shape[1]
    out_ids = np.full((b, max_len), pad_id, np.int32)
    img_start = np.zeros(b, np.int32)
    attn = np.zeros((b, max_len), np.int32)
    out_labels = np.full((b, max_len), IGNORE_INDEX, np.int32)

    for i in range(b):
        row = input_ids[i]
        row = row[row != pad_id] if pad_id is not None else row
        pos = np.where(row == IMAGE_TOKEN_INDEX)[0]
        assert len(pos) == 1, "expect exactly one image token"
        p = int(pos[0])
        pre, post = row[:p], row[p + 1 :]
        total = len(pre) + n_img + len(post)
        total = min(total, max_len)
        post_len = max(total - len(pre) - n_img, 0)
        out_ids[i, : len(pre)] = pre
        img_start[i] = len(pre)
        out_ids[i, len(pre) + n_img : total] = post[:post_len]
        attn[i, :total] = 1
        if labels is not None:
            lab = labels[i][labels[i] != pad_id] if pad_id is not None else labels[i]
            lab_pre, lab_post = lab[:p], lab[p + 1 :]
            out_labels[i, : len(pre)] = lab_pre
            out_labels[i, len(pre) + n_img : total] = lab_post[:post_len]

    embeds = embed_fn(jnp.asarray(out_ids))  # (B, L, D)
    # Scatter image features into their slots.
    img_start_j = jnp.asarray(img_start)

    def place(row_embeds, feats, start):
        return jax.lax.dynamic_update_slice(
            row_embeds, feats.astype(row_embeds.dtype), (start, 0)
        )

    embeds = jax.vmap(place)(embeds, image_features, img_start_j)
    return embeds, jnp.asarray(attn), jnp.asarray(out_labels)


def causal_lm_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Shifted CE ignoring IGNORE_INDEX (reference forward_llm loss_llm)."""
    logits = logits[:, :-1]
    targets = labels[:, 1:]
    valid = targets != IGNORE_INDEX
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.where(valid, targets, 0)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return (nll * valid).sum() / jnp.maximum(valid.sum(), 1)


def beam_generate(
    model, params, inputs_embeds: jax.Array, attention_mask: jax.Array,
    max_new_tokens: int = 32, num_beams: int = 5, eos_id: int = 2,
    length_penalty: float = 1.0,
):
    """Jitted beam search (the reference generates with num_beams=5,
    xdecoder_model.py:611-617). Beams ride the batch dimension of one
    shared KV cache; one lax.scan step expands all beams and reselects the
    top-k by accumulated (length-penalized) log prob. Returns
    (B, max_new_tokens) tokens of the best beam."""
    b, prompt_len, d = inputs_embeds.shape
    k = num_beams
    c = model.cfg

    logits, caches = model.apply(
        params, inputs_embeds, attention_mask, method=type(model).prefill
    )
    logp0 = jax.nn.log_softmax(logits, -1)  # (B, V)
    v = logp0.shape[-1]
    top_lp, top_tok = jax.lax.top_k(logp0, k)  # (B, k)

    # Tile caches/beams: (B*k, ...)
    def tile(x):
        return jnp.repeat(x, k, axis=0)

    caches = [
        {"k": tile(cc["k"]), "v": tile(cc["v"]), "offset": cc["offset"]}
        for cc in caches
    ]
    pad_mask = jnp.pad(
        attention_mask == 0, ((0, 0), (0, c.max_seq_len - prompt_len)),
        constant_values=False,
    )
    pad_mask = tile(pad_mask)

    beam_scores = top_lp.reshape(b * k)  # (B*k,)
    cur_tok = top_tok.reshape(b * k)
    finished = jnp.zeros((b * k,), bool)
    tokens0 = jnp.zeros((b * k, max_new_tokens), jnp.int32)
    tokens0 = tokens0.at[:, 0].set(cur_tok)

    def step(carry, i):
        tokens, cur_tok, beam_scores, finished, caches = carry
        emb = model.apply(params, cur_tok[:, None], method=type(model).embed)
        logits, caches = model.apply(
            params, emb, caches, prompt_len + i, pad_mask,
            method=type(model).decode_step,
        )
        logp = jax.nn.log_softmax(logits, -1)  # (B*k, V)
        # Finished beams only extend with eos at no cost.
        frozen = jnp.full_like(logp, -1e9).at[:, eos_id].set(0.0)
        logp = jnp.where(finished[:, None], frozen, logp)
        cand = beam_scores[:, None] + logp  # (B*k, V)
        cand = cand.reshape(b, k * v)
        new_scores, flat_idx = jax.lax.top_k(cand, k)  # (B, k)
        beam_idx = flat_idx // v + jnp.arange(b)[:, None] * k  # into B*k
        new_tok = (flat_idx % v).astype(jnp.int32)

        beam_idx = beam_idx.reshape(b * k)
        tokens = jnp.take(tokens, beam_idx, axis=0)
        tokens = tokens.at[:, i + 1].set(new_tok.reshape(b * k))
        finished = jnp.take(finished, beam_idx, axis=0) | (
            new_tok.reshape(b * k) == eos_id
        )
        caches = [
            {
                "k": jnp.take(cc["k"], beam_idx, axis=0),
                "v": jnp.take(cc["v"], beam_idx, axis=0),
                "offset": cc["offset"],
            }
            for cc in caches
        ]
        return (
            tokens, new_tok.reshape(b * k), new_scores.reshape(b * k),
            finished, caches,
        ), None

    (tokens, _, beam_scores, _, _), _ = jax.lax.scan(
        step, (tokens0, cur_tok, beam_scores, finished, caches),
        jnp.arange(max_new_tokens - 1),
    )
    lengths = jnp.argmax(tokens == eos_id, axis=1)
    lengths = jnp.where((tokens == eos_id).any(1), lengths + 1, max_new_tokens)
    norm = beam_scores / (lengths.astype(jnp.float32) ** length_penalty)
    best = jnp.argmax(norm.reshape(b, k), axis=1) + jnp.arange(b) * k
    return jnp.take(tokens, best, axis=0)


def greedy_generate(
    model, params, inputs_embeds: jax.Array, attention_mask: jax.Array,
    max_new_tokens: int = 64, eos_id: int = 2,
):
    """Jitted greedy decode: prefill the full prompt, then scan one token at
    a time through the KV cache. Returns (B, max_new_tokens) token ids."""
    b, prompt_len, d = inputs_embeds.shape
    c = model.cfg

    def run(params, inputs_embeds, attention_mask):
        logits, caches = model.apply(
            params, inputs_embeds, attention_mask, method=type(model).prefill
        )
        next_tok = jnp.argmax(logits, -1)
        pad_mask = attention_mask == 0
        pad_mask = jnp.pad(
            pad_mask, ((0, 0), (0, c.max_seq_len - prompt_len)),
            constant_values=False,
        )

        def step(carry, i):
            tok, caches = carry
            emb = model.apply(params, tok[:, None], method=type(model).embed)
            logits, caches = model.apply(
                params, emb, caches, prompt_len + i, pad_mask,
                method=type(model).decode_step,
            )
            nxt = jnp.argmax(logits, -1)
            return (nxt, caches), nxt

        (_, _), toks = jax.lax.scan(
            step, (next_tok, caches), jnp.arange(max_new_tokens - 1)
        )
        return jnp.concatenate([next_tok[None], toks], 0).T  # (B, new)

    return run(params, inputs_embeds, attention_mask)
