"""Vicuna-7B-shape LLM serving bench on the real chip (VERDICT r2 item 2).

Measures, for the exact LLaMA-7B architecture the reference serves
(/root/reference/llm/load_llm.py:29-49 — Vicuna-7B, 8-bit frozen):
- whether the model fits v5e HBM (bf16 weights 13.5 GB; int8 ~6.9 GB),
- prefill latency for the LLaVA-style spliced prompt (vision prefix ~101
  tokens + instruction, reference llava_arch.py:64-195),
- greedy decode throughput (tokens/s) with the static KV cache.

Protocol: decode runs as ONE jitted lax.scan of N self-feeding steps
(argmax -> embed -> next step), so a single dispatch covers all device
work; tokens/s = N / (t_scan(N) - t_scan(1)) differencing cancels the
dispatch RTT of the tunnel. Weights are random — throughput depends only
on shapes/dtypes.

Usage: python scripts/bench_llm_7b.py [bf16|int8|both]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iuvl_tpu.models.llm.llama import LlamaConfig, LlamaForCausalLM  # noqa: E402

PROMPT_LEN = 128  # ~101 vision tokens + instruction
MAX_SEQ = 256
DECODE_N = 32


def build(quant: str):
    cfg = LlamaConfig(
        vocab_size=32000, dim=4096, layers=32, heads=32, kv_heads=32,
        ffn_dim=11008, max_seq_len=MAX_SEQ, dtype="bfloat16",
        param_dtype="bfloat16", quant=quant,
    )
    llm = LlamaForCausalLM(cfg=cfg)
    emb0 = jnp.zeros((1, PROMPT_LEN, cfg.dim), jnp.bfloat16)
    m0 = jnp.ones((1, PROMPT_LEN), jnp.int32)
    params = jax.jit(lambda r: llm.init(r, emb0, m0))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    return llm, params, emb0, m0


def param_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def decode_scan(llm, params, caches, first_tok_emb, n_steps: int, offset0: int):
    """n_steps greedy self-feeding decode steps inside one program."""

    def body(carry, i):
        caches, x_emb = carry
        logits, caches = llm.apply(
            params, x_emb, caches, offset0 + i,
            method=LlamaForCausalLM.decode_step,
        )
        tok = jnp.argmax(logits, axis=-1)  # (B,)
        x_emb = llm.apply(params, tok[:, None],
                          method=LlamaForCausalLM.embed)
        return (caches, x_emb), tok

    (_, _), toks = jax.lax.scan(
        body, (caches, first_tok_emb), jnp.arange(n_steps)
    )
    return toks


def bench_variant(quant: str) -> dict:
    llm, params, emb0, m0 = build(quant)
    pb = param_bytes(params)
    stats = jax.local_devices()[0].memory_stats() or {}
    print(f"[{quant}] params {pb / 1e9:.2f} GB; device bytes_in_use "
          f"{stats.get('bytes_in_use', 0) / 1e9:.2f} GB", file=sys.stderr)

    # ---- prefill ---- #
    prefill = jax.jit(lambda p, e, m: llm.apply(
        p, e, m, method=LlamaForCausalLM.prefill))
    logits, caches = prefill(params, emb0, m0)
    jax.block_until_ready((logits, caches))
    lat = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        logits2, caches = prefill(params, emb0, m0)
        float(logits2.sum())
        lat = min(lat, time.perf_counter() - t0)

    # ---- decode: differencing scan(1) vs scan(DECODE_N) ---- #
    first_emb = llm.apply(params, jnp.argmax(logits, -1)[:, None],
                          method=LlamaForCausalLM.embed)
    run1 = jax.jit(lambda p, c, e: decode_scan(llm, p, c, e, 1, PROMPT_LEN))
    runk = jax.jit(lambda p, c, e: decode_scan(llm, p, c, e, DECODE_N,
                                               PROMPT_LEN))
    for f in (run1, runk):
        jax.block_until_ready(f(params, caches, first_emb))
    t1 = tk = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = run1(params, caches, first_emb)
        int(r[0, 0])
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        r = runk(params, caches, first_emb)
        int(r[0, 0])
        tk = min(tk, time.perf_counter() - t0)
    per_tok = (tk - t1) / (DECODE_N - 1)
    out = {
        "quant": quant,
        "param_gb": round(pb / 1e9, 2),
        "hbm_gb": round(stats.get("bytes_in_use", 0) / 1e9, 2),
        "prefill_ms": round(lat * 1e3, 2),
        "decode_tok_s": round(1.0 / per_tok, 2),
        "decode_ms_tok": round(per_tok * 1e3, 3),
    }
    print(json.dumps(out), file=sys.stderr)
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    results = []
    if which in ("bf16", "both"):
        results.append(bench_variant("none"))
    if which in ("int8", "both"):
        results.append(bench_variant("int8"))
    print(json.dumps(results))
