"""LLaVA-style VQA / captioning generation pipeline.

Parity target: /root/reference/modeling/architectures/xdecoder_model.py
evaluate_vqa (:592-630) + evaluate_llm_captioning (:545-590): the unified
head runs in 'llm'/'vqa' task mode to produce 100 object-query features,
``img_to_lang`` projects them to the LLM width, they're spliced at the
<image> position of the conversation prompt, and the (frozen) Vicuna
decodes the answer. The reference uses HF beam search (num_beams 5); here
generation is a jitted KV-cache loop — greedy by default, beam search via
``num_beams > 1`` (multimodal.beam_generate). For multi-chip serving use
``iuvl_tpu.parallel.serve_vqa`` (tensor-parallel LLaMA over ``model``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .conversation import default_conversation
from .llama import LlamaForCausalLM
from .multimodal import (
    NUM_IMAGE_TOKENS,
    greedy_generate,
    splice_image_features,
    tokenizer_image_token,
)


def build_vqa_prompt(question: str) -> str:
    """Vicuna-format single-turn VQA prompt with image placeholder."""
    conv = default_conversation()
    conv.append_message(conv.roles[0], f"<image>\n{question}")
    conv.append_message(conv.roles[1], None)
    return conv.get_prompt()


def answer_questions(
    syslearner,
    sl_params,
    llm: LlamaForCausalLM,
    llm_params,
    tokenizer,
    images: jax.Array,  # (B, H, W, 3)
    questions: Sequence[str],
    max_new_tokens: int = 32,
    max_len: int = 256,
    num_beams: int = 1,
) -> list[str]:
    """End-to-end VQA: vision features -> projector -> splice -> generate."""
    b = images.shape[0]
    ctx_len = syslearner.cfg.contxt_len

    # Question context tokens for the unified head's 'llm' branch
    # (reference get_instruction_token_embeddings path).
    toks = tokenizer(list(questions), max_length=ctx_len)
    token_emb_fn = jax.jit(
        lambda p, ids, m: syslearner.apply(
            p, ids, m, method=type(syslearner).encode_text_tokens
        )[0]
    )
    ctx_tokens = token_emb_fn(
        sl_params, jnp.asarray(toks["input_ids"]),
        jnp.asarray(toks["attention_mask"]),
    )

    feat_fn = jax.jit(
        lambda p, img, ctx: syslearner.apply(
            p, img, ctx, method=type(syslearner).forward_llm_features
        )
    )
    image_features = feat_fn(sl_params, images, ctx_tokens)  # (B, 100, llm_dim)

    # Build prompts and splice.
    prompt_ids = [
        tokenizer_image_token(build_vqa_prompt(q), tokenizer) for q in questions
    ]
    t = max(len(p) for p in prompt_ids)
    ids = np.zeros((b, t), np.int32)
    for i, p in enumerate(prompt_ids):
        ids[i, : len(p)] = p
    embed_fn = lambda x: llm.apply(llm_params, x, method=LlamaForCausalLM.embed)
    embeds, attn, _ = splice_image_features(
        ids, embed_fn, image_features, max_len=max_len, pad_id=0
    )
    # Trim to the longest real sequence for the prefill.
    real_len = int(np.asarray(attn.sum(1)).max())
    embeds = embeds[:, :real_len]
    attn = attn[:, :real_len]

    if num_beams > 1:
        from .multimodal import beam_generate

        out_tokens = beam_generate(
            llm, llm_params, embeds, attn, max_new_tokens=max_new_tokens,
            num_beams=num_beams,
        )
    else:
        out_tokens = greedy_generate(
            llm, llm_params, embeds, attn, max_new_tokens=max_new_tokens
        )
    return tokenizer.batch_decode(np.asarray(out_tokens), skip_special_tokens=True)


def caption_images(
    syslearner, sl_params, llm, llm_params, tokenizer, images,
    prompt: str = "Describe the image in one sentence.", **kw,
) -> list[str]:
    """LLM captioning (reference evaluate_llm_captioning)."""
    return answer_questions(
        syslearner, sl_params, llm, llm_params, tokenizer, images,
        [prompt] * images.shape[0], **kw,
    )
