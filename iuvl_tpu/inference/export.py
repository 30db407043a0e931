"""Serialized model export (deployment).

Role of /root/reference/sam/utils/onnx.py (the ONNX mask-decoder export):
on the TPU stack the portable artifact is a `jax.export` serialized
StableHLO function. ``export_decode`` packages the one-encode/many-decode
prompt path (the latency-critical serving function); ``export_eval_seg``
packages the full eval forward. Artifacts are bytes, loadable with
``jax.export.deserialize`` in any JAX runtime (CPU/GPU/TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def export_decode(model, params, num_prompts: int = 64, points_per_prompt: int = 1):
    """Serialize decode_prompts(sam_embedding, points, labels) -> masks."""
    grid = model.cfg.sam_config().grid if hasattr(model.cfg, "sam_config") else model.cfg.grid

    def fn(params, emb, points, labels):
        return model.apply(
            params, emb, points=points, labels=labels,
            method=type(model).decode_prompts,
        )["masks"]

    emb = jax.ShapeDtypeStruct((num_prompts, grid, grid, 256), jnp.float32)
    pts = jax.ShapeDtypeStruct((num_prompts, points_per_prompt, 2), jnp.float32)
    labs = jax.ShapeDtypeStruct((num_prompts, points_per_prompt), jnp.int32)
    exported = jax.export.export(jax.jit(fn))(params, emb, pts, labs)
    return exported.serialize()


def export_eval_seg(model, params, image_size: int | None = None,
                    num_classes: int = 134):
    """Serialize evaluate_seg(images, text_embeddings)."""
    s = image_size or model.cfg.img_size
    d = model.cfg.syslearner_dim

    def fn(params, images, text_emb):
        return model.apply(
            params, images, text_emb, method=type(model).evaluate_seg
        )

    images = jax.ShapeDtypeStruct((1, s, s, 3), jnp.float32)
    text = jax.ShapeDtypeStruct((num_classes, d), jnp.float32)
    exported = jax.export.export(jax.jit(fn))(params, images, text)
    return exported.serialize()


def load_exported(data: bytes):
    """Deserialize an exported function; call via ``.call(*args)``."""
    return jax.export.deserialize(data)
