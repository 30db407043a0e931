"""A/B evaluate_seg with msdeform_impl wide vs scan (b=1, 1024^2, bf16)."""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from iuvl_tpu.models.xdecoder.model import SysLearner, SysLearnerConfig


def timed_diff(run1, runk, args, k_minus_1):
    float(run1(*args)); float(runk(*args))
    b1 = bk = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(run1(*args))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(runk(*args))
        bk = min(bk, time.perf_counter() - t0)
    return (bk - b1) / k_minus_1


def main():
    images0 = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 1024, 1024, 3)) * 255
    params = None
    impls = sys.argv[1:] or ["wide", "scan"]
    for impl in impls:
        cfg = SysLearnerConfig(
            sam_size="base", img_size=1024, dtype="bfloat16",
            attn_impl="auto", msdeform_impl=impl,
        )
        model = SysLearner(cfg=cfg)
        text = jnp.zeros((134, cfg.syslearner_dim), jnp.float32)
        if params is None:
            params = jax.jit(
                lambda r: model.init(r, images0, text,
                                     method=SysLearner.warmup)
            )(jax.random.PRNGKey(0))

        def full(p, i):
            cls_, pred = model.apply(
                p, i, text, method=SysLearner.evaluate_seg)
            return pred.mean().astype(jnp.float32)

        def chain(p, i, iters):
            def body(carry, _):
                return full(p, i + carry * 1e-12), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return out

        import os
        scoped = os.environ.get("IUVL_SCOPED_VMEM_KIB")
        copts = ({"xla_tpu_scoped_vmem_limit_kib": int(scoped)}
                 if scoped else None)
        r1 = jax.jit(lambda p, i: chain(p, i, 1), compiler_options=copts)
        rk = jax.jit(lambda p, i: chain(p, i, 9), compiler_options=copts)
        ms = timed_diff(r1, rk, (params, img), 8.0) * 1e3
        print(json.dumps({"impl": impl, "scoped_vmem_kib": scoped,
                          "evaluate_seg_ms": round(ms, 2),
                          "img_per_s": round(1e3 / ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
