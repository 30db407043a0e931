"""Measure evaluate_seg throughput at batch sizes 1/2/4 (real TPU).

Encode is latency/kernel-count bound (~31% MXU) and the two-way/pixel-decoder
paths carry per-kernel overheads, so batching images should amortize them;
the deformable gathers are row-rate bound and scale linearly. This measures
where the win saturates."""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from iuvl_tpu.models.xdecoder.model import SysLearner, SysLearnerConfig


def main():
    cfg = SysLearnerConfig(
        sam_size="base", img_size=1024, dtype="bfloat16", attn_impl="auto",
        msdeform_impl="auto",
    )
    model = SysLearner(cfg=cfg)
    images0 = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    text = jnp.zeros((134, cfg.syslearner_dim), jnp.float32)
    params = jax.jit(
        lambda r: model.init(r, images0, text, method=SysLearner.warmup)
    )(jax.random.PRNGKey(0))

    for bs in (1, 2, 4):
        img = jax.random.uniform(
            jax.random.PRNGKey(1), (bs, 1024, 1024, 3)) * 255

        def chained(params, img, iters):
            def body(carry, _):
                cls_, pred = model.apply(
                    params, img + carry * 1e-12, text,
                    method=SysLearner.evaluate_seg,
                )
                return pred.mean().astype(jnp.float32), None
            final, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=iters)
            return final

        run1 = jax.jit(lambda p, i: chained(p, i, 1))
        runk = jax.jit(lambda p, i: chained(p, i, 9))
        float(run1(params, img)); float(runk(params, img))
        best1 = bestk = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(run1(params, img))
            best1 = min(best1, time.perf_counter() - t0)
            t0 = time.perf_counter(); float(runk(params, img))
            bestk = min(bestk, time.perf_counter() - t0)
        per_call = (bestk - best1) / 8.0
        print(json.dumps({
            "batch": bs, "ms_per_call": round(per_call * 1e3, 2),
            "ms_per_img": round(per_call * 1e3 / bs, 2),
            "img_per_s": round(bs / per_call, 3),
        }))


if __name__ == "__main__":
    main()
