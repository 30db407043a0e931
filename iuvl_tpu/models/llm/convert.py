"""HF LLaMA checkpoint -> flax params converter.

Maps the HuggingFace `LlamaForCausalLM` state-dict naming (used by the
reference's Vicuna-7B load, llm/load_llm.py:29-49) to this package's
parameter tree. Pure numpy; torch only needed to read .bin/.safetensors.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t)


def convert_llama(sd: Mapping, layers: int) -> dict:
    """HF keys: model.embed_tokens.weight, model.layers.{i}.self_attn.{q,k,v,o}_proj,
    .mlp.{gate,up,down}_proj, .input_layernorm, .post_attention_layernorm,
    model.norm.weight, lm_head.weight."""
    p: dict = {
        "embed_tokens": _np(sd["model.embed_tokens.weight"]),
        "final_norm": {"weight": _np(sd["model.norm.weight"])},
        "lm_head": _np(sd["lm_head.weight"]).T,
    }
    for i in range(layers):
        h = f"model.layers.{i}"
        p[f"layer{i}"] = {
            "input_norm": {"weight": _np(sd[f"{h}.input_layernorm.weight"])},
            "post_attn_norm": {
                "weight": _np(sd[f"{h}.post_attention_layernorm.weight"])
            },
            "attn": {
                "q_proj": {"kernel": _np(sd[f"{h}.self_attn.q_proj.weight"]).T},
                "k_proj": {"kernel": _np(sd[f"{h}.self_attn.k_proj.weight"]).T},
                "v_proj": {"kernel": _np(sd[f"{h}.self_attn.v_proj.weight"]).T},
                "o_proj": {"kernel": _np(sd[f"{h}.self_attn.o_proj.weight"]).T},
            },
            "gate_proj": {"kernel": _np(sd[f"{h}.mlp.gate_proj.weight"]).T},
            "up_proj": {"kernel": _np(sd[f"{h}.mlp.up_proj.weight"]).T},
            "down_proj": {"kernel": _np(sd[f"{h}.mlp.down_proj.weight"]).T},
        }
    return {"params": p}


def load_hf_llama_params(path: str, cfg) -> dict:
    """Read an HF LLaMA/Vicuna checkpoint directory (sharded .safetensors or
    pytorch_model*.bin) and convert to this package's tree (the stand-in for
    the reference's AutoModelForCausalLM.from_pretrained, llm/load_llm.py:
    29-49)."""
    import glob
    import os

    sd: dict = {}
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            sd.update(load_file(f))
    else:
        import torch

        bins = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
        if not bins:
            raise FileNotFoundError(f"no LLaMA weights under {path}")
        for f in bins:
            sd.update(torch.load(f, map_location="cpu"))
    return convert_llama(sd, cfg.layers)
