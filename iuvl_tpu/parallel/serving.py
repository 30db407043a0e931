"""Multi-chip SPMD serving: batch-parallel vision, tensor-parallel LLM.

The reference serves single-GPU (its mpirun setup is train-only); this
module is the TPU-native serving counterpart of SURVEY §5's comm-backend
row: one ``Mesh`` with ``data`` x ``model`` axes, vision params replicated
and request batches sharded over ``data``, LLaMA weights tensor-parallel
over ``model`` (column/row-parallel projections —
models/llm/llama.llama_param_shardings — with XLA inserting the psums on
the row-parallel matmuls). All placement is declarative NamedShardings;
jit specializes one SPMD program per request shape.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..runtime.mesh import MeshSpec, create_mesh


@dataclasses.dataclass
class ServingContext:
    """Mesh + placement helpers for inference fleets."""

    mesh: Any

    @classmethod
    def create(cls, data: int | None = None, model: int = 1, devices=None):
        n = len(devices or jax.devices())
        data = data if data is not None else n // model
        return cls(
            mesh=create_mesh(
                MeshSpec(data=data, model=model),
                devices=(devices or jax.devices())[: data * model],
            )
        )

    # ---------------- placement ---------------- #
    def replicate(self, tree):
        return jax.device_put(tree, NamedSharding(self.mesh, P()))

    def shard_batch(self, tree):
        return jax.device_put(tree, NamedSharding(self.mesh, P("data")))

    def shard_llm(self, llm_params):
        from ..models.llm.llama import llama_param_shardings

        specs = llama_param_shardings(llm_params)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            llm_params, specs,
        )

    @property
    def data_size(self) -> int:
        return self.mesh.shape["data"]


def serve_seg(
    ctx: ServingContext, model, params, images, text_emb,
):
    """Batch-parallel panoptic/semantic serving: images sharded over
    ``data``, params replicated; returns host (mask_cls, mask_pred).
    Pad the batch to a multiple of ctx.data_size."""
    from ..models.xdecoder.model import SysLearner

    params = ctx.replicate(params)
    images = ctx.shard_batch(jnp.asarray(images))
    text_emb = ctx.replicate(jnp.asarray(text_emb))
    fn = jax.jit(
        lambda p, i, t: model.apply(p, i, t, method=SysLearner.evaluate_seg)
    )
    cls_, pred = fn(params, images, text_emb)
    return jax.device_get((cls_, pred))


def serve_vqa(
    ctx: ServingContext,
    syslearner, sl_params,
    llm, llm_params,
    tokenizer,
    images,  # (B, H, W, 3), B % data_size == 0
    questions: Sequence[str],
    max_new_tokens: int = 32,
    max_len: int = 256,
    num_beams: int = 1,
) -> list[str]:
    """End-to-end VQA over the mesh: the vision tower runs data-parallel
    over the request batch while every LLM matmul is tensor-parallel over
    ``model`` (reference evaluate_vqa is single-device,
    xdecoder_model.py:592-630)."""
    from ..models.llm.vqa_pipeline import answer_questions

    sl_params = ctx.replicate(sl_params)
    llm_params = ctx.shard_llm(llm_params)
    images = ctx.shard_batch(jnp.asarray(images))
    return answer_questions(
        syslearner, sl_params, llm, llm_params, tokenizer, images,
        list(questions), max_new_tokens=max_new_tokens, max_len=max_len,
        num_beams=num_beams,
    )


def pad_batch(arrays, multiple: int):
    """Host helper: right-pad the leading dim to a multiple (repeat last
    row) and return (padded, real_count)."""
    out = []
    n = None
    for a in arrays:
        a = np.asarray(a)
        n = len(a)
        pad = (-n) % multiple
        if pad:
            a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
        out.append(a)
    return out, n
