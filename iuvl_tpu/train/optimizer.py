"""Optimizer / LR-schedule factory, TPU-native (optax).

Parity target: /root/reference/trainer/xdecoder_trainer.py:37-182 —
AdamW with per-parameter rules: zero weight decay for norm params, biases,
embeddings and relative-position tables (WEIGHT_DECAY_NORM/EMBED = 0.0),
name-matched LR multipliers (SOLVER.LR_MULTIPLIER), full-model grad-norm
clipping (CLIP_GRADIENTS CLIP_VALUE 5.0), and detectron2's WarmupMultiStepLR
(warmup 10 iters, milestones at fractions of total steps, gamma 0.1).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import optax

NO_DECAY_TOKENS = (
    "bias",
    "scale",  # LayerNorm/GroupNorm scales
    "norm",
    "pos_embed",
    "rel_pos",
    "positional_embedding",
    "token_embedding",
    "query_feat",
    "query_embed",
    "level_embed",
    "logit_scale",
    "point_embeddings",
    "not_a_point_embed",
    "no_mask_embed",
    "iou_token",
    "mask_tokens",
    "gaussian_matrix",
    "pos_embed_caping",
)


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    ).lower()


def decay_mask(params) -> dict:
    """True where weight decay applies."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not any(t in _path_str(path) for t in NO_DECAY_TOKENS),
        params,
    )


def lr_multiplier_tree(params, multipliers: Mapping[str, float]) -> dict:
    """Per-leaf LR multiplier by substring match on the param path
    (reference xdecoder_trainer.py LR_MULTIPLIER name matching)."""

    def mult(path, _):
        p = _path_str(path)
        for key, m in multipliers.items():
            if key.lower() in p:
                return m
        return 1.0

    return jax.tree_util.tree_map_with_path(mult, params)


def build_lr_schedule(
    base_lr: float,
    total_steps: int,
    warmup_iters: int = 10,
    warmup_factor: float = 1.0,
    milestones: Sequence[float] = (0.4, 0.8),
    gamma: float = 0.1,
) -> optax.Schedule:
    """WarmupMultiStepLR (detectron2 semantics used by the reference)."""
    boundaries = {}
    for i, frac in enumerate(milestones):
        step = int(frac * total_steps) if frac <= 1 else int(frac)
        boundaries[step] = gamma
    piecewise = optax.piecewise_constant_schedule(base_lr, boundaries)

    def schedule(step):
        warm = jnp.where(
            step < warmup_iters,
            warmup_factor + (1.0 - warmup_factor) * step / max(warmup_iters, 1),
            1.0,
        )
        return warm * piecewise(step)

    return schedule


def build_optimizer(
    params,
    base_lr: float = 1e-4,
    weight_decay: float = 0.05,
    total_steps: int = 10000,
    clip_norm: float = 5.0,
    lr_multipliers: Mapping[str, float] | None = None,
    warmup_iters: int = 10,
    milestones: Sequence[float] = (0.4, 0.8),
    gamma: float = 0.1,
    frozen_substrings: Sequence[str] = (),
) -> optax.GradientTransformation:
    """Full optimizer chain: clip -> adamw(masked wd) -> lr mult -> freeze."""
    schedule = build_lr_schedule(
        base_lr, total_steps, warmup_iters=warmup_iters,
        milestones=milestones, gamma=gamma,
    )
    chain = [
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            weight_decay=weight_decay,
            mask=decay_mask(params),
        ),
    ]
    if lr_multipliers:
        mults = lr_multiplier_tree(params, lr_multipliers)
        chain.append(_scale_by_tree(mults))
    if frozen_substrings:
        freeze_mask = jax.tree_util.tree_map_with_path(
            lambda path, _: any(s.lower() in _path_str(path) for s in frozen_substrings),
            params,
        )
        chain.append(optax.masked(optax.set_to_zero(), freeze_mask))
    return optax.chain(*chain)


def _scale_by_tree(mults) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, m: u * m, updates, mults), state

    return optax.GradientTransformation(init_fn, update_fn)
