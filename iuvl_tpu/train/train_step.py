"""Jitted/pjit train step for the seg stream.

Replaces the reference's eager loop (trainer/default_trainer.py:118-140 +
pipeline/XDecoderPipeline.py:86-102): one compiled SPMD program computes
forward, criterion (with host-callback Hungarian), backward and optimizer
update. Data parallelism = batch sharding over the ``data`` mesh axis; the
DDP gradient all-reduce becomes a compiler-inserted psum (SURVEY.md §5).
bf16 activations with fp32 params/optimizer replace the reference's fp16
GradScaler AMP (TPU-idiomatic; no loss scaling needed for bf16).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..losses.criterion import SegCriterion, SegTargets


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


def split_seg_outputs(outputs: dict, num_queries: int, grounding: bool = False):
    """Slice head outputs into the object-query block (and grounding block),
    reference forward_seg:352-380."""
    nq = num_queries

    def slice_block(o, lo, hi):
        return {
            "pred_logits": o["pred_logits"][:, lo:hi] if o.get("pred_logits") is not None else None,
            "pred_masks": o["pred_masks"][:, lo:hi],
        }

    obj = slice_block(outputs, 0, nq - 1)
    obj["aux_outputs"] = [slice_block(a, 0, nq - 1) for a in outputs["aux_outputs"]]
    if not grounding:
        return obj, None
    grd = slice_block(outputs, nq, 2 * nq - 1)
    grd["pred_captions"] = outputs["pred_captions"][:, nq : 2 * nq - 1]
    grd["aux_outputs"] = [slice_block(a, nq, 2 * nq - 1) for a in outputs["aux_outputs"]]
    return obj, grd


def make_joint_train_step(
    model,
    criterion: SegCriterion,
    tx: optax.GradientTransformation,
    match_points: int = 12544,
    captioning_weight: float = 2.0,
    retrieval_weight: float = 2.0,
    donate: bool = True,
) -> Callable:
    """Joint seg + vlp step (reference JointLoader batches, forward routing
    xdecoder_model.py:281-303). Signature:
    train_step(state, seg_batch, vlp_batch, text_embeddings, rng) where
    vlp_batch = dict(images, caption_ids, caption_mask) or None (static)."""
    from ..losses.grounding import captioning_loss, retrieval_loss

    def loss_fn(params, seg_images, text_embeddings, targets, vlp_batch, rng):
        losses = {}
        outputs = model.apply(
            params, seg_images, text_embeddings, method=type(model).forward_seg
        )
        obj, _ = split_seg_outputs(outputs, model.cfg.num_queries)
        losses.update(criterion(rng, obj, targets, match_points=match_points))

        if vlp_batch is not None:
            out = model.apply(
                params, vlp_batch["images"], vlp_batch["caption_ids"],
                vlp_batch["caption_mask"],
                method=type(model).forward_vlp_train,
            )
            losses["loss_captioning_0"] = captioning_weight * captioning_loss(
                out["pred_captionings"], out["token_table"],
                vlp_batch["caption_ids"], vlp_batch["caption_mask"],
            )
            losses["loss_retrieval_decoder_0"] = retrieval_weight * retrieval_loss(
                out["pred_captions"][:, -1], out["caption_class_emb"],
                out["logit_scale"],
            )
        total = sum(losses.values())
        return total, losses

    def train_step(state: TrainState, seg_images, text_embeddings, targets,
                   vlp_batch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, seg_images, text_embeddings, targets, vlp_batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            {"loss_total": total, **losses},
        )

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_train_step(
    model,
    criterion: SegCriterion,
    tx: optax.GradientTransformation,
    match_points: int = 12544,
    donate: bool = True,
) -> Callable:
    """Returns jitted train_step(state, images, text_embeddings, targets, rng)
    -> (state, metrics)."""

    def loss_fn(params, images, text_embeddings, targets: SegTargets, rng):
        outputs = model.apply(
            params, images, text_embeddings, method=type(model).forward_seg
        )
        obj, _ = split_seg_outputs(outputs, model.cfg.num_queries)
        losses = criterion(rng, obj, targets, match_points=match_points)
        total = sum(losses.values())
        return total, losses

    def train_step(state: TrainState, images, text_embeddings, targets, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, text_embeddings, targets, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss_total": total, **losses}
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
