"""Instruction-tuning train step (stage 2).

Parity target: reference forward_llm (xdecoder_model.py:438-464) +
step2_instruction.yaml: the unified head produces 100 object-query features
(DETACHED — reference :457), ``img_to_lang`` projects them, they're spliced
into the conversation embedding sequence, and the frozen Vicuna computes
the causal-LM loss (loss_llm, weight 1.0). Trainable parameters: the
projector (and optionally the vision stack); the LLM is frozen via the
optimizer mask (reference freezes via requires_grad + bitsandbytes).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..models.llm.multimodal import causal_lm_loss
from .train_step import TrainState


def make_llm_train_step(
    syslearner,
    llm,
    tx: optax.GradientTransformation,
    llm_weight: float = 1.0,
    donate: bool = True,
) -> Callable:
    """Returns jitted step(state, llm_params, images, ctx_tokens,
    inputs_embeds_ids..., rng). The caller pre-splices host-side
    (splice_image_features) EXCEPT the image slots, passing:
    - images (B, H, W, 3)
    - ctx_tokens (B, 77, C) question token embeddings for the 'llm' head
    - base_embeds (B, L, D) token embeddings with zero image slots
    - img_start (B,) slot offsets, attention_mask (B, L), labels (B, L)
    state.params = syslearner params (trained); llm_params frozen."""

    def loss_fn(params, llm_params, images, ctx_tokens, base_embeds,
                img_start, attention_mask, labels):
        feats = syslearner.apply(
            params, images, ctx_tokens,
            method=type(syslearner).forward_llm_features,
        )  # (B, 100, llm_dim) — backbone detached inside, projector live

        def place(row, f, start):
            return jax.lax.dynamic_update_slice(
                row, f.astype(row.dtype), (start, 0)
            )

        embeds = jax.vmap(place)(base_embeds, feats, img_start)
        logits = llm.apply(llm_params, embeds, attention_mask)
        loss = llm_weight * causal_lm_loss(logits, labels)
        return loss, {"loss_llm": loss}

    def step(state: TrainState, llm_params, images, ctx_tokens, base_embeds,
             img_start, attention_mask, labels):
        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, llm_params, images, ctx_tokens, base_embeds,
            img_start, attention_mask, labels,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            {"loss_total": total, **metrics},
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def prepare_llm_batch(tokenizer, llm, llm_params, questions_ids, labels,
                      num_image_tokens: int = 100, max_len: int = 1024):
    """Host-side: conversation ids (with one IMAGE_TOKEN_INDEX) -> dense
    (base_embeds, img_start, attention_mask, labels) for the jitted step."""
    import numpy as np

    from ..models.llm.llama import LlamaForCausalLM
    from ..models.llm.multimodal import IGNORE_INDEX, IMAGE_TOKEN_INDEX

    b = len(questions_ids)
    out_ids = np.zeros((b, max_len), np.int32)
    img_start = np.zeros(b, np.int32)
    attn = np.zeros((b, max_len), np.int32)
    out_labels = np.full((b, max_len), IGNORE_INDEX, np.int32)
    for i, row in enumerate(questions_ids):
        row = np.asarray(row)
        p = int(np.where(row == IMAGE_TOKEN_INDEX)[0][0])
        pre, post = row[:p], row[p + 1 :]
        total = min(len(pre) + num_image_tokens + len(post), max_len)
        post_len = max(total - len(pre) - num_image_tokens, 0)
        out_ids[i, : len(pre)] = pre
        img_start[i] = len(pre)
        out_ids[i, len(pre) + num_image_tokens : total] = post[:post_len]
        attn[i, :total] = 1
        lab = np.asarray(labels[i])
        lab_pre, lab_post = lab[:p], lab[p + 1 :]
        out_labels[i, : len(pre)] = lab_pre
        out_labels[i, len(pre) + num_image_tokens : total] = lab_post[:post_len]

    base_embeds = llm.apply(
        llm_params, jnp.asarray(out_ids), method=LlamaForCausalLM.embed
    )
    return (
        base_embeds, jnp.asarray(img_start), jnp.asarray(attn),
        jnp.asarray(out_labels),
    )
