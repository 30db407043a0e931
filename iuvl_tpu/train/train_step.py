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

import os
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..losses.criterion import SegCriterion, SegTargets


def train_compiler_options() -> Optional[dict]:
    """Compiler options for training programs on TPU.

    Under remat the flash-attention forward kernel's pipeline buffers are
    live concurrently with the fused backward kernels, and the combined
    scoped-VMEM stack overflows XLA's default 16 MB limit (~1-3 MB over at
    1024^2). v5e/v4 have 128 MB of VMEM per core, so raising the scoped
    stack to 24 MB costs nothing; eval/serving programs keep the default.
    Override via $IUVL_SCOPED_VMEM_KIB (0 disables)."""
    if jax.default_backend() != "tpu":
        return None
    kib = int(os.environ.get("IUVL_SCOPED_VMEM_KIB", "24576"))
    return {"xla_tpu_scoped_vmem_limit_kib": kib} if kib else None


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
        out = {
            "pred_logits": o["pred_logits"][:, lo:hi] if o.get("pred_logits") is not None else None,
            "pred_masks": o["pred_masks"][:, lo:hi],
        }
        if o.get("pred_boxes") is not None:
            out["pred_boxes"] = o["pred_boxes"][:, lo:hi]
        return out

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
    backbone_weight: float = 8.0,  # reference step1.yaml BACKBONER_WEIGHT
    spatial_weight: float = 5.0,  # reference mask bce/dice weight class
    language_loss_layers: int = 10,
    donate: bool = True,
    loss_only: bool = False,
) -> Callable:
    """Joint seg + vlp step (reference JointLoader batches, forward routing
    xdecoder_model.py:281-303). Signature:
    train_step(state, seg_images, text_embeddings, targets, vlp_batch,
    seg_extras, rng). vlp_batch = dict(images, caption_ids, caption_mask)
    or None; seg_extras adds the caption/grounding stream targets
    (phrase_embs/phrase_valid/phrase_groups for loss_captions;
    grounding_tokens/valid/masks/class_embs/groups/target_valid/task_weight
    for loss_groundings). None members are static branch switches.

    Live-text mode (the step1 product path): ``text_embeddings`` may be a
    dict {ids (K, L), mask} and seg_extras may carry token IDS instead of
    embeddings — phrase_ids/phrase_mask (B, P, L) and grounding_ids/
    grounding_mask (B, G, L) + grounding_target_valid (B, G). The step then
    computes every text embedding from LIVE params inside loss_fn so the
    text tower trains through the seg/caption/grounding losses (reference
    computes them inside forward_seg for the same reason,
    xdecoder_model.py:336 + prepare_targets:968-1020)."""
    from ..losses.grounding import (
        GroundingConfig,
        GroundingTargets,
        caption_loss,
        captioning_loss,
        grounding_cost,
        grounding_losses,
        retrieval_loss,
        spatial_losses,
    )
    from ..losses.matcher import batched_hungarian, compute_match_cost

    gcfg = GroundingConfig(num_points=match_points)

    def loss_fn(params, seg_images, text_embeddings, targets, vlp_batch,
                seg_extras, rng):
        losses = {}
        seg_extras = dict(seg_extras or {})

        # ---- live text-tower embeddings (gradient flows into the text
        # encoder, matching the reference's in-forward get_text_embeddings /
        # get_text_token_embeddings; ADVICE r1: no stale constant caches) --- #
        if isinstance(text_embeddings, dict):
            text_embeddings = model.apply(
                params, text_embeddings["ids"], text_embeddings["mask"],
                method=type(model).encode_text_embeddings,
            )  # (K, D) normalized, live params
        if "phrase_ids" in seg_extras:
            pid, pmask = seg_extras["phrase_ids"], seg_extras["phrase_mask"]
            bb, pp, ll = pid.shape
            _, cls = model.apply(
                params, pid.reshape(bb * pp, ll), pmask.reshape(bb * pp, ll),
                method=type(model).encode_text_tokens,
            )
            seg_extras["phrase_embs"] = cls.reshape(bb, pp, -1)
        if "grounding_ids" in seg_extras:
            gid, gmask = seg_extras["grounding_ids"], seg_extras["grounding_mask"]
            bb, gg, ll = gid.shape
            tok, cls = model.apply(
                params, gid.reshape(bb * gg, ll), gmask.reshape(bb * gg, ll),
                method=type(model).encode_text_tokens,
            )
            c = tok.shape[-1]
            # Flattened per-token grounding queries (the reference's ragged
            # query_emb concat, xdecoder_model.py:1000-1006, made static).
            seg_extras["grounding_tokens"] = tok.reshape(bb, gg * ll, c)
            seg_extras["grounding_valid"] = gmask.reshape(bb, gg * ll).astype(bool)
            seg_extras["grounding_class_embs"] = cls.reshape(bb, gg, c)
            # NB: per-slot target validity must arrive as
            # ``grounding_target_valid`` (B, G); ``grounding_valid`` here is
            # the per-TOKEN decoder-input validity (B, G*L).

        has_grounding = "grounding_tokens" in seg_extras
        outputs = model.apply(
            params, seg_images, text_embeddings,
            grounding_tokens=seg_extras.get("grounding_tokens"),
            grounding_valid=seg_extras.get("grounding_valid"),
            method=type(model).forward_seg,
        )
        obj, grd = split_seg_outputs(
            outputs, model.cfg.num_queries, grounding=has_grounding
        )

        # ---- ALL matching costs of the step, solved in ONE batched call
        # (criterion + per-layer caption + per-layer grounding): the
        # device auction matcher's while_loop runs every problem as a
        # parallel lane, so ~30 matchings cost about one 60 ms solve
        # instead of 30 (batched_hungarian docstring). rng draw sequences
        # are identical to the former per-loop matching. ---------------- #
        all_costs, crit_kept = criterion.collect_costs(
            rng, obj, targets, match_points=match_points
        )
        n_crit = len(all_costs)

        nq = model.cfg.num_queries
        # Per-layer language losses (reference applies loss_captions /
        # loss_groundings to the final + all aux layers up to top_x_layers;
        # `language_loss_layers` caps the depth, counted from the last).
        n_layers = len(outputs["aux_outputs"]) + 1
        layer_ids = range(max(0, n_layers - language_loss_layers), n_layers)

        def layer_out(i):
            if i == n_layers - 1:
                return outputs
            return outputs["aux_outputs"][i]

        cap_records = []
        if "phrase_embs" in seg_extras:
            for i in layer_ids:
                o = layer_out(i)
                rng, r_cap, r_m = jax.random.split(rng, 3)
                all_costs.append(compute_match_cost(
                    r_m,
                    jax.lax.stop_gradient(o["pred_logits"][:, : nq - 1]),
                    jax.lax.stop_gradient(o["pred_masks"][:, : nq - 1]),
                    targets.labels, targets.masks, targets.valid,
                    num_points=match_points,
                ))
                cap_records.append((i, o, r_cap))
        grd_records = []
        gt = None
        if has_grounding and "grounding_masks" in seg_extras:
            gt = GroundingTargets(
                masks=seg_extras["grounding_masks"],
                class_embs=seg_extras["grounding_class_embs"],
                group_matrix=seg_extras["grounding_groups"],
                valid=seg_extras["grounding_target_valid"],
                task_weight=seg_extras["grounding_task_weight"],
            )
            for i in layer_ids:
                o = layer_out(i)
                rng, r_g = jax.random.split(rng)
                all_costs.append(grounding_cost(
                    r_g, o["pred_masks"][:, nq : 2 * nq - 1],
                    o["pred_captions"][:, nq : 2 * nq - 1], gt,
                    _logit_scale(params), gcfg,
                ))
                grd_records.append((i, o, r_g))

        assigns = batched_hungarian(all_costs)
        losses.update(criterion.losses_from_assignments(
            crit_kept, assigns[:n_crit], targets
        ))
        off = n_crit
        for (i, o, r_cap), assigned in zip(cap_records,
                                           assigns[off:off + len(cap_records)]):
            suffix = "_0" if i == n_layers - 1 else f"_{i + 1}"
            losses[f"loss_caption{suffix}"] = caption_loss(
                r_cap, o["pred_captions"][:, : nq - 1],
                assigned, targets.labels, targets.valid, text_embeddings,
                seg_extras["phrase_embs"], seg_extras["phrase_valid"],
                seg_extras["phrase_groups"], _logit_scale(params),
            )
        off += len(cap_records)
        for (i, o, r_g), assigned in zip(grd_records, assigns[off:]):
            suffix = "_0" if i == n_layers - 1 else f"_{i + 1}"
            g_losses = grounding_losses(
                r_g, o["pred_masks"][:, nq : 2 * nq - 1],
                o["pred_captions"][:, nq : 2 * nq - 1], gt,
                _logit_scale(params), gcfg, assigned=assigned,
            )
            losses.update(
                {k.replace("_0", suffix): v for k, v in g_losses.items()}
            )

        if "spatial_points" in seg_extras:
            # Spatial-prompt stream: trains the SAM->unified-decoder
            # injection (identical encode_image subgraph — XLA CSEs the
            # backbone with the seg forward above).
            rng, r_sp = jax.random.split(rng)
            sp = model.apply(
                params, seg_images, seg_extras["spatial_points"],
                seg_extras["spatial_labels"],
                method=type(model).forward_spatial_train,
            )
            losses.update({
                k: spatial_weight * v
                for k, v in spatial_losses(
                    r_sp, sp, seg_extras["spatial_masks"],
                    seg_extras["spatial_valid"], num_points=match_points,
                ).items()
            })

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
            if "backbone_emb" in out:
                # Backbone ITC branch of the retrieval ensemble (reference
                # forward_vlp:427-435 loss_retrieval_backbone_0, weight
                # BACKBONER_WEIGHT=8.0 in step1.yaml:173).
                losses["loss_retrieval_backbone_0"] = (
                    backbone_weight * retrieval_loss(
                        out["backbone_emb"], out["caption_class_emb"],
                        out["logit_scale"],
                    )
                )
        total = sum(losses.values())
        return total, losses

    def _logit_scale(params):
        return params["params"]["lang_encoder"]["logit_scale"]

    def train_step(state: TrainState, seg_images, text_embeddings, targets,
                   vlp_batch, seg_extras, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, seg_images, text_embeddings, targets, vlp_batch,
            seg_extras, rng,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            {"loss_total": total, **losses},
        )

    if loss_only:
        # Forward-only metrics on raw params (no grad, no optimizer) — a
        # much cheaper compile used for matcher-implementation parity
        # checks (host scipy vs device JV must yield identical losses).
        def eval_losses(params, seg_images, text_embeddings, targets,
                        vlp_batch, seg_extras, rng):
            total, losses = loss_fn(params, seg_images, text_embeddings,
                                    targets, vlp_batch, seg_extras, rng)
            return {"loss_total": total, **losses}

        return jax.jit(eval_losses)

    return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                   compiler_options=train_compiler_options())


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

    return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                   compiler_options=train_compiler_options())
