"""Weight-only int8 quantization for the frozen LLaMA/Vicuna.

Role of the reference's bitsandbytes 8-bit load (llm/load_llm.py:29-49):
the 7B LLM is frozen during stage-2/serving, so its weights can be stored
and streamed as int8 with per-output-channel absmax scales — halving the
HBM footprint and weight-read bandwidth on TPU. The matmuls still run in
bf16 on the MXU after an on-the-fly dequant that XLA fuses into the
operand read (see llama.QuantDense).

Quantized projections: q/k/v/o + gate/up/down per block (>99% of 7B
params outside the embedding tables). Embeddings / norms / lm_head stay
fp (matching bitsandbytes' skip list).
"""

from __future__ import annotations

import numpy as np

_QUANT_KEYS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
    "down_proj",
)


def _quantize_kernel(w: np.ndarray) -> dict:
    """(in, out) fp -> int8 kernel + per-out-channel absmax scale."""
    w = np.asarray(w, np.float32)
    absmax = np.abs(w).max(axis=0)
    scale = (absmax / 127.0).astype(np.float32)
    safe = np.where(scale > 0, scale, 1.0)
    q = np.clip(np.round(w / safe[None, :]), -127, 127).astype(np.int8)
    return {"kernel_q": q, "kernel_scale": np.where(absmax > 0, scale, 1.0)}


def quantize_llama_params(params: dict) -> dict:
    """fp param tree (LlamaForCausalLM, quant='none') -> the tree expected
    by the same model with cfg.quant='int8'."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k in _QUANT_KEYS
                    and isinstance(v, dict)
                    and "kernel" in v
                ):
                    out[k] = _quantize_kernel(np.asarray(v["kernel"]))
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)


def quantized_size_bytes(params: dict) -> int:
    import jax

    return sum(
        np.asarray(x).nbytes for x in jax.tree.leaves(params)
    )
