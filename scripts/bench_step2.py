"""Step2 instruction-tuning on-chip train throughput (VERDICT r3 item 5).

Reference recipe (configs/step2_instruction.yaml + xdecoder_model.py:
438-464): instruction stream at 1 img/GPU; the unified head's 100
object-query features are DETACHED, projected by img_to_lang, spliced into
the conversation embeds, and the FROZEN Vicuna-7B computes the causal-LM
loss — gradients reach only the projector. Here: ViT-B 1024^2 bf16 vision,
7B-shape LLaMA bf16 frozen, seq len 512, adamw masked to img_to_lang (the
reference's trainable set for this stream), one donated jitted step.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_step2.py
Prints one JSON line {"step2_train_images_per_sec_per_chip": ...} plus
timing detail on stderr; importable (run_step2_bench) for bench.py.

Scope note (VERDICT r4 weak-7): the conversation rows are RANDOM
pre-embedded tensors (base_embeds = randn, labels random) — timing-valid
because shapes and dataflow are the real recipe (frozen 32-layer LLaMA,
detached vision, live projector, grads through all layers), but the
prepare_llm_batch -> step integration at 7B is NOT exercised here; the
tiny-config e2e test (tests/test_step2_e2e.py) and the multichip gate's
stage-2 section cover that wiring.
"""
from __future__ import annotations

import json
import sys
import time


def run_step2_bench(batch: int = 1, seq_len: int = 512):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from iuvl_tpu.models.llm.llama import LlamaConfig, LlamaForCausalLM
    from iuvl_tpu.models.xdecoder.model import SysLearner, SysLearnerConfig
    from iuvl_tpu.train.llm_step import make_llm_train_step
    from iuvl_tpu.train.train_step import TrainState, train_compiler_options

    cfg = SysLearnerConfig(
        sam_size="base", img_size=1024, dtype="bfloat16", attn_impl="auto",
        msdeform_impl="auto", remat=True, llm_dim=4096,
    )
    model = SysLearner(cfg=cfg)
    img0 = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    text0 = jnp.zeros((134, cfg.syslearner_dim), jnp.float32)
    params = jax.jit(
        lambda r: model.init(r, img0, text0, method=SysLearner.warmup)
    )(jax.random.PRNGKey(0))

    lcfg = LlamaConfig(
        vocab_size=32000, dim=4096, layers=32, heads=32, kv_heads=32,
        ffn_dim=11008, max_seq_len=seq_len, dtype="bfloat16",
        param_dtype="bfloat16",
    )
    llm = LlamaForCausalLM(cfg=lcfg)
    emb0 = jnp.zeros((1, seq_len, lcfg.dim), jnp.bfloat16)
    m0 = jnp.ones((1, seq_len), jnp.int32)
    llm_params = jax.jit(lambda r: llm.init(r, emb0, m0))(jax.random.PRNGKey(1))
    jax.block_until_ready(llm_params)

    # adamw on the projector only (reference: vision detached, LLM frozen).
    def proj_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: any(
                getattr(k, "key", None) == "img_to_lang" for k in path),
            params,
        )

    tx = optax.masked(optax.adamw(1e-5), proj_mask)
    step = make_llm_train_step(model, llm, tx)

    rs = np.random.RandomState(0)
    b = batch
    images = jnp.asarray(rs.rand(b, 1024, 1024, 3) * 255, jnp.float32)
    ctx = jnp.asarray(rs.randn(b, cfg.contxt_len, cfg.syslearner_dim) * 0.02,
                      jnp.float32)
    base = jnp.asarray(rs.randn(b, seq_len, lcfg.dim) * 0.02, jnp.bfloat16)
    img_start = jnp.full((b,), 5, jnp.int32)
    attn = jnp.ones((b, seq_len), jnp.int32)
    labels = jnp.asarray(
        np.where(rs.rand(b, seq_len) < 0.3, -100,
                 rs.randint(0, 32000, (b, seq_len))), jnp.int32)

    state = TrainState.create(params, tx)
    del params
    state, metrics = step(state, llm_params, images, ctx, base, img_start,
                          attn, labels)
    float(metrics["loss_llm"])  # compile + warm
    per_step = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, metrics = step(state, llm_params, images, ctx, base,
                              img_start, attn, labels)
        float(metrics["loss_llm"])
        per_step = min(per_step, time.perf_counter() - t0)
    print(f"step2: {per_step*1e3:.1f} ms/step at B={b} L={seq_len} "
          f"(loss {float(metrics['loss_llm']):.3f})", file=sys.stderr,
          flush=True)
    return {"step2_train_images_per_sec_per_chip": round(b / per_step, 3),
            "step2_ms_per_step": round(per_step * 1e3, 1)}


if __name__ == "__main__":
    print(json.dumps(run_step2_bench()))
