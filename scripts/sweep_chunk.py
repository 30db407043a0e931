"""Sweep the decode chunk size for the bench protocol (1024 prompts total).

The 256-prompt chunk was tuned before the round-2 kernel overhaul; per-step
overheads changed. Chained-scan differencing per bench.py.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from iuvl_tpu.models.sam.build import Sam, SamConfig


def main():
    cfg = SamConfig(dtype="bfloat16", attn_impl="auto")
    model = Sam(cfg=cfg)
    n_prompts = 1024

    images0 = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    pts1 = jnp.zeros((1, 1, 2), jnp.float32)
    lab1 = jnp.ones((1, 1), jnp.int32)
    params = jax.jit(lambda rng: model.init(rng, images0, pts1, lab1))(
        jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 1024, 1024, 3)) * 255

    normalized = jax.jit(lambda p, i: model.apply(p, i, method=Sam.normalize))(
        params, img)
    emb, _ = jax.jit(lambda p, i: model.apply(p, i, method=Sam.encode_image))(
        params, normalized)

    chunks = [int(a) for a in sys.argv[1:]] or [128, 256, 512]
    for chunk in chunks:
        assert n_prompts % chunk == 0, (
            f"chunk {chunk} must divide {n_prompts} or the per-1024 number "
            "is skewed"
        )
        n_chunks = n_prompts // chunk
        all_pts = jax.random.uniform(
            jax.random.PRNGKey(2), (n_chunks, chunk, 1, 2)) * 1024
        all_labs = jnp.ones((n_chunks, chunk, 1), jnp.int32)

        def dec(carry, params, emb, all_pts, all_labs):
            def body(c, inp):
                pts, labs = inp
                masks = model.apply(
                    params, emb + c * 1e-12, points=pts, labels=labs,
                    method=Sam.decode_from_embedding)["masks"]
                return c + masks.mean().astype(jnp.float32), None
            total, _ = jax.lax.scan(body, carry, (all_pts, all_labs))
            return total

        def chain(iters):
            def run(params, emb, all_pts, all_labs):
                def body(c, _):
                    return dec(c, params, emb, all_pts, all_labs), None
                out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=iters)
                return out
            return jax.jit(run)

        run1, runk = chain(1), chain(9)
        args = (params, emb, all_pts, all_labs)
        float(run1(*args)); float(runk(*args))
        b1 = bk = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); float(run1(*args))
            b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter(); float(runk(*args))
            bk = min(bk, time.perf_counter() - t0)
        t = (bk - b1) / 8
        print(f"chunk {chunk:4d}: decode-1024-prompts {t*1e3:7.2f} ms "
              f"({t/n_chunks*1e3:6.2f} ms/chunk)", flush=True)


if __name__ == "__main__":
    main()
